package graft.query

import graft.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** Rate semantics, porting the reference's RateTest scenarios
 *  (counter resets, rollover, deltas, boundaries). */
class RateOperatorSpec extends AnyFunSuite {

  private val tagset = Map("host" -> "a")

  private def rates(df: org.apache.spark.sql.DataFrame, spec: RateSpec): Map[Long, Double] =
    QueryEngine.rate(df, spec).select("ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("simple rate: (v - prev) / Δt; first point dropped") {
    val df = Fixtures.series("m", tagset, (0L, 10.0), (10L, 30.0), (40L, 90.0))
    val out = rates(df, RateSpec())
    assert(out === Map(10L -> 2.0, 40L -> 2.0))
  }

  test("rate interval scales the denominator") {
    val df = Fixtures.series("m", tagset, (0L, 0.0), (60L, 120.0))
    assert(rates(df, RateSpec(interval = "1m")) === Map(60L -> 120.0))
    assert(rates(df, RateSpec(interval = "1s")) === Map(60L -> 2.0))
  }

  test("deltaOnly: raw differences, no time division") {
    val df = Fixtures.series("m", tagset, (0L, 10.0), (10L, 7.0), (30L, 17.0))
    assert(rates(df, RateSpec(deltaOnly = true)) === Map(10L -> -3.0, 30L -> 10.0))
  }

  test("counter with dropResets: decreases vanish") {
    val df = Fixtures.series("m", tagset, (0L, 10.0), (10L, 20.0), (20L, 5.0), (30L, 15.0))
    val out = rates(df, RateSpec(counter = true, dropResets = true))
    assert(out === Map(10L -> 1.0, 30L -> 1.0)) // the 20→5 reset is dropped
  }

  test("counter rollover: counterMax - prev + v over Δt (reference :444-455)") {
    val df = Fixtures.series("m", tagset, (0L, 90.0), (10L, 10.0))
    val out = rates(df, RateSpec(counter = true, counterMax = 100.0))
    assert(out === Map(10L -> 2.0)) // (100 - 90 + 10) / 10
  }

  test("resetValue clamps absurd rollover rates to zero") {
    val df = Fixtures.series("m", tagset, (0L, 90.0), (10L, 10.0), (20L, 11.0))
    val out = rates(df, RateSpec(counter = true, counterMax = 1e9, resetValue = 5.0))
    assert(out(10L) === 0.0) // rollover rate ≈ 1e8/10 > resetValue ⇒ 0
    assert(out(20L) === 0.1)
  }

  test("rate-to-count: v × min(Δt, mode-of-deltas) (reference :364-420,438-440)") {
    // deltas 10,10,30 ⇒ mode 10; the 30s gap is capped at the mode
    val df = Fixtures.series("m", tagset, (0L, 1.0), (10L, 2.0), (20L, 3.0), (50L, 4.0))
    val out = rates(df, RateSpec(rateToCount = true))
    assert(out === Map(10L -> 20.0, 20L -> 30.0, 50L -> 40.0))
  }

  test("per-series independence: lag never crosses series") {
    val df = Fixtures.points(
      ("m", Map("h" -> "a"), 0L, 0.0, 0L), ("m", Map("h" -> "a"), 10L, 10.0, 1L),
      ("m", Map("h" -> "b"), 5L, 100.0, 2L), ("m", Map("h" -> "b"), 15L, 130.0, 3L))
    val out = QueryEngine.rate(df, RateSpec())
      .select("tags", "ts", "value").collect()
      .map(r => (r.getMap[String, String](0)("h"), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out === Map(("a", 10L) -> 1.0, ("b", 15L) -> 3.0))
  }

  test("rate crosses segment boundaries (better than the reference's NaN-at-boundary)") {
    val seg = graft.core.TsdbSchema.SegmentSeconds
    val df = Fixtures.series("m", tagset, (seg - 10, 0.0), (seg + 10, 40.0))
    assert(rates(df, RateSpec()) === Map((seg + 10) -> 2.0))
  }
}
