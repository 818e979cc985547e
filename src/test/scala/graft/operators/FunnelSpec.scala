package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel ordering semantics: steps count only at-or-after the previous
 *  step's time; drop-off keys survive with NULL steps; a same-timestamp
 *  step counts (>= boundary). */
class FunnelSpec extends AnyFunSuite {

  test("ordered chain, drop-off NULLs, same-ts boundary, pre-step events ignored") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Seq(
      // u1 converts fully, with a decoy click BEFORE the view
      ("u1", "click", 5L), ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      // u2 views and clicks at the SAME ts (boundary: counts), never buys
      ("u2", "view", 10L), ("u2", "click", 10L),
      // u3 only views; u4 never views (drops out entirely)
      ("u3", "view", 7L),
      ("u4", "click", 1L), ("u4", "purchase", 2L)
    ).toDF("user", "etype", "ts")
    val out = Funnel.conversion(ev, col("user"), col("etype"), col("ts"),
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("u1", "u2", "u3"))
    val u1 = out("u1")
    assert(u1.getLong(1) === 10L && u1.getLong(2) === 20L && u1.getLong(3) === 30L
      && u1.getInt(4) === 3) // decoy click@5 ignored
    val u2 = out("u2")
    assert(u2.getLong(2) === 10L && u2.isNullAt(3) && u2.getInt(4) === 2)
    val u3 = out("u3")
    assert(u3.isNullAt(2) && u3.isNullAt(3) && u3.getInt(4) === 1)
    intercept[IllegalArgumentException] {
      Funnel.conversion(ev, col("user"), col("etype"), col("ts"), Seq("view"))
    }
  }

  test("maxGapSec: a step outside the window breaks the chain like a missing one") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Seq(
      // u1: click 10s after view (inside a 60s gap), purchase 100s after
      // the click (OUTSIDE) — chain breaks at purchase
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 120L),
      // u2: everything within the window; the boundary (exactly +gap) counts
      ("u2", "view", 10L), ("u2", "click", 70L), ("u2", "purchase", 130L),
      // u3: first click too late, but a SECOND click in a fresh window
      // can't rescue it — the window anchors on the completed previous
      // step, and view is the only completed step
      ("u3", "view", 10L), ("u3", "click", 100L)
    ).toDF("user", "etype", "ts")
    val out = Funnel.conversion(ev, col("user"), col("etype"), col("ts"),
        Seq("view", "click", "purchase"), maxGapSec = Some(60L))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u1").getLong(2) === 20L && out("u1").isNullAt(3) && out("u1").getInt(4) === 2)
    assert(out("u2").getLong(2) === 70L && out("u2").getLong(3) === 130L
      && out("u2").getInt(4) === 3) // both at exactly +60: boundary counts
    assert(out("u3").isNullAt(2) && out("u3").getInt(4) === 1)
    intercept[IllegalArgumentException] {
      Funnel.conversion(ev, col("user"), col("etype"), col("ts"),
        Seq("view", "click"), maxGapSec = Some(0L))
    }
  }
}
