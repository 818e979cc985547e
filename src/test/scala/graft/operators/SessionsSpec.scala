package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sessionization semantics: the gap boundary is INCLUSIVE — an event
 *  at exactly last+gap merges (this pin is what licenses the oracle's
 *  `> gap` break restatement); one second beyond splits. Per-key
 *  independence; null values counted but not summed. */
class SessionsSpec extends AnyFunSuite {

  test("gap boundary: <= gap merges (inclusive), > gap splits; keys independent; null values counted not summed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Seq(
      ("a", 0L, Some(1.0)), ("a", 3599L, Some(2.0)),   // same session (gap 3600)
      ("a", 7199L, None),                              // exactly 3600 after 3599 → MERGES
      ("a", 10800L, Some(4.0)),                        // 3601 after 7199 → NEW session
      ("b", 0L, Some(5.0))
    ).toDF("user", "ts", "value")
    val out = Sessions.sessionize(ev, col("user"), col("ts"), col("value"), 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    assert(out === Set(
      ("a", 0L, 7199L, 3L, Some(3.0)), // null value: counted, not summed
      ("a", 10800L, 10800L, 1L, Some(4.0)),
      ("b", 0L, 0L, 1L, Some(5.0))))
    // widen by one second: everything merges into one session for a
    val merged = Sessions.sessionize(ev, col("user"), col("ts"), col("value"), 3601L)
      .filter(col("key") === "a").collect()
    assert(merged.length === 1 && merged.head.getLong(3) === 4L)
    intercept[IllegalArgumentException] {
      Sessions.sessionize(ev, col("user"), col("ts"), col("value"), 0L)
    }
  }
}
