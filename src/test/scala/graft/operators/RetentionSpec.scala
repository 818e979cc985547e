package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cohort arithmetic: cohort day = first-event epoch-day, day_k exact,
 *  multiple same-day events collapse (distinct), k=0 is cohort size. */
class RetentionSpec extends AnyFunSuite {

  test("cohort day, day_k cells, same-day dedup") {
    val spark = TestSpark.spark
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      ("u1", 0L), ("u1", 100L),            // day 0 twice → one k=0 credit
      ("u1", day + 5),                     // day 1 → k=1
      ("u2", 0L), ("u2", 2 * day),         // cohort 0, k=0 and k=2
      ("u3", day)                          // cohort day 1, k=0
    ).toDF("user", "ts")
    val out = Retention.cohorts(ev, col("user"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L,  // u1 + u2 cohorted day 0
      (0L, 1L) -> 1L,  // u1 back on day 1
      (0L, 2L) -> 1L,  // u2 back on day 2
      (1L, 0L) -> 1L)) // u3 cohorted day 1
  }

  test("pre-1970 timestamps floor to the previous epoch-day (no toward-zero truncation)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ts = -1 s is day -1 under floor division; a double-divide-then-
    // cast truncates it to day 0 and silently merges it with epoch day 0
    val ev = Seq(("u1", -1L), ("u1", 0L), ("u2", -86400L)).toDF("user", "ts")
    val out = Retention.cohorts(ev, col("user"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (-1L, 0L) -> 2L,  // u1 cohorted day -1 (floor), u2 exactly day -1
      (-1L, 1L) -> 1L)) // u1 back on day 0 = k 1
  }
}
