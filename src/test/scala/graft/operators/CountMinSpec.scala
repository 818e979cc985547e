package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count–min sketch invariants: never-underestimate, exactness at
 *  collision-free width, and the merge-equals-batch contract the
 *  streamed maintenance depends on. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a skewed key stream: key k_i appears i times (1..20), 210 rows
  private def skewed = (1 to 20).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")

  test("estimates never undercount, and a wide sketch is exact") {
    val rep = CountMin.report(skewed, col("k"), depth = 4, width = 4096, k = 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rep.length === 20)
    // 20 keys in 4096 cells: no collisions at any depth in practice —
    // and even if one row collides, min over 4 rows recovers exactness
    rep.foreach { case (k, (exact, est)) =>
      assert(est === exact, s"$k: wide sketch must be exact")
      assert(exact === k.drop(1).toLong)
    }
  }

  test("narrow sketch overcounts but stays within the epsilon*N bound") {
    val n = 210L
    val rep = CountMin.report(skewed, col("k"), depth = 4, width = 8, k = 20)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rep.foreach { case (exact, est) =>
      assert(est >= exact, "count-min never underestimates")
      // e/w * N with w=8 → ~71; generous but real (cells carry ~26 avg)
      assert(est - exact <= (math.E / 8 * n).toLong + 1, s"over by ${est - exact}")
    }
    assert(rep.exists { case (exact, est) => est > exact },
      "8 cells for 20 keys must collide somewhere")
  }

  test("merge of per-batch partials equals the one-shot sketch") {
    val (a, b) = ((1 to 20).flatMap(i => Seq.fill(i / 2)(s"k$i")),
      (1 to 20).flatMap(i => Seq.fill(i - i / 2)(s"k$i")))
    def cellMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("i").cast("long"), col("j").cast("long"), col("cnt").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cellMap(CountMin.sketch(skewed, col("k"), 4, 64))
    val merged = cellMap(CountMin.merge(
      CountMin.sketch(a.toDF("k"), col("k"), 4, 64)
        .unionByName(CountMin.sketch(b.toDF("k"), col("k"), 4, 64))))
    assert(merged === whole)
  }

  test("estimate returns 0 for keys the sketch never saw (modulo collisions)") {
    val cells = CountMin.sketch(Seq("a").toDF("k"), col("k"), 4, 4096)
    val est = CountMin.estimate(cells, Seq("zzz-absent").toDF("key"), 4, 4096)
      .collect().head.getLong(1)
    assert(est === 0L)
  }
}
