package graft.query

import graft.Fixtures
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Dense interval-array output + time shift, porting the reference's
 *  dense double[] semantics (AuraMetricsNumericArrayIterator.java:583-657)
 *  and ShiftTest scenarios. */
class DenseFillSpec extends AnyFunSuite {

  private val tagset = Map("h" -> "a")

  test("every interval index exists; missing buckets are NaN, not absent") {
    // data in minutes 0 and 3 of a 5-minute range
    val df = Fixtures.series("m", tagset, (10L, 1.0), (190L, 4.0))
    val ds = QueryEngine.downsample(df, DownsampleSpec("1m", "sum"), 0, 300)
    val dense = QueryEngine.denseFill(ds, "1m", 0, 300)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dense.keySet === Set(0L, 60L, 120L, 180L, 240L))
    assert(dense(0L) === 1.0 && dense(180L) === 4.0)
    assert(dense(60L).isNaN && dense(120L).isNaN && dense(240L).isNaN)
  }

  test("dense grid covers each matched series independently") {
    val df = Fixtures.points(
      ("m", Map("h" -> "a"), 10L, 1.0, 0L),
      ("m", Map("h" -> "b"), 70L, 2.0, 1L))
    val ds = QueryEngine.downsample(df, DownsampleSpec("1m", "sum"), 0, 120)
    val dense = QueryEngine.denseFill(ds, "1m", 0, 120)
    assert(dense.count() === 4) // 2 series × 2 buckets
    assert(dense.filter(org.apache.spark.sql.functions.isnan(col("value"))).count() === 2)
  }

  test("fill policies: zero/scalar/null fill absent buckets; present values untouched; bad policy raises") {
    val df = Fixtures.series("m", tagset, (10L, 1.0), (190L, 4.0))
    val ds = QueryEngine.downsample(df, DownsampleSpec("1m", "sum"), 0, 300)
    def fills(policy: String, scalar: Double = 0.0): Map[Long, Option[Double]] =
      QueryEngine.denseFill(ds, "1m", 0, 300, fill = policy, fillScalar = scalar)
        .select("bucket_ts", "value").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val zero = fills("zero")
    assert(zero(0L) === Some(1.0) && zero(60L) === Some(0.0) && zero(240L) === Some(0.0))
    val sc = fills("scalar", -7.5)
    assert(sc(180L) === Some(4.0) && sc(120L) === Some(-7.5))
    val nul = fills("null")
    assert(nul(0L) === Some(1.0) && nul(60L) === None)
    intercept[IllegalArgumentException] {
      QueryEngine.denseFill(ds, "1m", 0, 300, fill = "lerp")
    }
  }

  test("real-value fill: previous/next stop at the series edge, prefer falls through, " +
      "lerp interpolates between both neighbours") {
    // real buckets 60 (v=2) and 180 (v=4) on a 5-bucket grid — bucket 0
    // has no previous real value, bucket 240 no next, and bucket 120 sits
    // exactly halfway between the two real neighbours
    val df = Fixtures.series("m", tagset, (70L, 2.0), (190L, 4.0))
    val ds = QueryEngine.downsample(df, DownsampleSpec("1m", "sum"), 0, 300)
    def fills(real: String): Map[Long, Option[Double]] =
      QueryEngine.denseFill(ds, "1m", 0, 300, fill = "null", realFill = Some(real))
        .select("bucket_ts", "value").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(fills("previous") === Map(0L -> None, 60L -> Some(2.0), 120L -> Some(2.0),
      180L -> Some(4.0), 240L -> Some(4.0)))
    assert(fills("next") === Map(0L -> Some(2.0), 60L -> Some(2.0), 120L -> Some(4.0),
      180L -> Some(4.0), 240L -> None))
    // prefer_* fall through to the OTHER side at the edges — every bucket real
    assert(fills("prefer_previous") === Map(0L -> Some(2.0), 60L -> Some(2.0),
      120L -> Some(2.0), 180L -> Some(4.0), 240L -> Some(4.0)))
    assert(fills("prefer_next") === Map(0L -> Some(2.0), 60L -> Some(2.0),
      120L -> Some(4.0), 180L -> Some(4.0), 240L -> Some(4.0)))
    // 120 is (120-60)/(180-60) = 0.5 of the way: 2 + (4-2)·0.5 = 3;
    // edges have only one neighbour → constant policy (null)
    assert(fills("lerp") === Map(0L -> None, 60L -> Some(2.0), 120L -> Some(3.0),
      180L -> Some(4.0), 240L -> None))
    intercept[IllegalArgumentException] {
      QueryEngine.denseFill(ds, "1m", 0, 300, realFill = Some("bogus"))
    }
    // the JSON front end carries the axis (FillSpec.real) and validates it
    val parsed = TsdbJson.parseQuery(
      """{"start": 0, "end": 300,
         "downsample": {"interval": "1m", "aggregator": "sum"},
         "fill": {"policy": "null", "real": "lerp"}}""")
    assert(parsed.fill === Some(FillSpec(policy = "null", real = Some("lerp"))))
    intercept[IllegalArgumentException] {
      TsdbJson.parseQuery(
        """{"start": 0, "end": 300,
           "downsample": {"interval": "1m", "aggregator": "sum"},
           "fill": {"real": "bogus"}}""")
    }
  }

  test("interpolated group-by: a series' missing bucket contributes its lerp value " +
      "to the cross-series aggregate, not a hole or a zero") {
    // series A reports every minute (value 10); series B misses bucket 120
    // between real neighbours 2.0 and 4.0 → interpolated 3.0. The group
    // sum at 120 must be 13.0 (lerp), not 10.0 (hole) — the upstream
    // interpolatorConfigs semantic. Edges take the ZERO constant policy.
    val a = Fixtures.points(
      (0L to 240L by 60L).map(t => ("m", Map("host" -> "w1"), t + 1, 10.0, t + 1)): _*)
    val b = Fixtures.points(
      ("m", Map("host" -> "w2"), 70L, 2.0, 1L), ("m", Map("host" -> "w2"), 190L, 4.0, 2L))
    val ds = QueryEngine.downsample(a.unionByName(b), DownsampleSpec("1m", "sum"), 0, 300)
    val filled = QueryEngine.denseFill(ds, "1m", 0, 300, fill = "zero", realFill = Some("lerp"))
    // group-all across hosts per bucket
    val sums = QueryEngine.groupBySpatial(filled, GroupBySpec(Seq.empty, "sum"))
      .collect().map(r => r.getLong(r.fieldIndex("bucket_ts")) ->
        r.getDouble(r.fieldIndex("value"))).toMap
    // B: edge buckets 0/240 → 0 (constant policy), 120 → lerp 3.0
    assert(sums === Map(0L -> 10.0, 60L -> 12.0, 120L -> 13.0, 180L -> 14.0, 240L -> 10.0))
  }

  test("time shift maps shifted data onto the query window (W5)") {
    import graft.filters.MatchAll
    // data lives one hour before the queried window
    val df = Fixtures.series("m", tagset, (100L, 5.0), (160L, 7.0))
    val q = TsdbQuery(MatchAll, 3600, 3900,
      downsample = Some(DownsampleSpec("1m", "sum")), shift = Some("1h"))
    val out = QueryEngine.run(df, q).select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ts 100 → 3700 (bucket 3660); ts 160 → 3760 (bucket 3720)
    assert(out === Map(3660L -> 5.0, 3720L -> 7.0))
  }

  test("shift composes with rate: deltas computed on shifted clock") {
    import graft.filters.MatchAll
    val df = Fixtures.series("m", tagset, (0L, 0.0), (10L, 20.0))
    val q = TsdbQuery(MatchAll, 3600, 3700, rate = Some(RateSpec()), shift = Some("1h"))
    val out = QueryEngine.run(df, q).select("ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(3610L -> 2.0))
  }

  test("analytic nodes without a downsample fail as a config error, not an unresolved column") {
    import graft.filters.MatchAll
    val df = Fixtures.series("m", tagset, (10L, 1.0), (190L, 4.0))
    // every analytic node consumes (bucket_ts, value); each must raise
    // the descriptive guard when no downsample produced that frame
    val cases = Seq(
      TsdbQuery(MatchAll, 0, 300, ratio = Some(RatioSpec(asPercent = false))),
      TsdbQuery(MatchAll, 0, 300, summarizer = Some(SummarizerSpec(Seq("avg")))),
      TsdbQuery(MatchAll, 0, 300, slidingWindow = Some(SlidingWindowSpec(2, "avg"))),
      TsdbQuery(MatchAll, 0, 300, topN = Some(TopNSpec(1, top = true))))
    cases.foreach { q =>
      val e = intercept[IllegalArgumentException] { QueryEngine.run(df, q) }
      assert(e.getMessage.contains("downsample"), s"got: ${e.getMessage}")
    }
  }

  test("tz grid labels: 23h spring-forward day is ONE slot; phantom skipped hour absent; " +
      "25h fall-back repeated hour dedupes to its shared label") {
    import graft.core.Intervals
    // US spring-forward 2024 (DownsampleOpSpec's fixture): Denver local
    // midnights Mar 10/11/12 sit at 07:00, 06:00, 06:00 UTC — the 23h
    // day is exactly one daily slot, never two
    val mar10 = 1710054000L
    assert(Intervals.tzGridLabels("America/Denver", 86400, mar10, mar10 + 3 * 86400 - 3600)
      === Seq(1710054000L, 1710136800L, 1710223200L))
    // hourly across the transition: local 02:00 never exists on the
    // timeline, so the grid walks 00,01 MST then 03,04 MDT — four slots
    // for four real hours, no phantom 02:00 slot
    assert(Intervals.tzGridLabels("America/Denver", 3600, mar10, mar10 + 4 * 3600)
      === Seq(1710054000L, 1710057600L, 1710061200L, 1710064800L))
    // fall-back 2024 (Nov 3): 25 epoch hours, but the repeated 01:00
    // local hour shares ONE label (the post-transition offset — the
    // tzBucket ambiguity rule), so the local day holds 24 hourly slots
    val nov3 = 1730613600L
    val fb = Intervals.tzGridLabels("America/Denver", 3600, nov3, nov3 + 25 * 3600)
    assert(fb.length === 24 && fb.head === nov3 && fb.contains(1730620800L))
    // and the grid is EXACTLY the label set tzBucket emits when every
    // epoch hour carries a point — the grid/downsample contract
    val pts = Fixtures.series("m", tagset,
      (0 until 25).map(h => (nov3 + h * 3600L, 1.0)): _*)
    val spec = DownsampleSpec("1h", "sum", timezone = Some("America/Denver"))
    val emitted = QueryEngine.downsample(pts, spec, nov3, nov3 + 25 * 3600)
      .select("bucket_ts").collect().map(_.getLong(0)).toSet
    assert(emitted === fb.toSet)
    // epoch-adjacent: west-of-UTC locals go NEGATIVE for ts < |offset|;
    // tzBucket floors with pmod (true floor), so the point at epoch
    // 1000 (local −24200 MST) labels into the local day STARTING
    // Dec 31 1969 (−61200 = −86400 + 25200) — the label the grid
    // enumerates — instead of a future bucket as sign-following `%`
    // would produce. Grid and bucketing must agree here too.
    val earlyGrid = Intervals.tzGridLabels("America/Denver", 86400, 0L, 2 * 86400)
    assert(earlyGrid === Seq(-61200L, 25200L, 111600L))
    val earlyPts = Fixtures.series("m", tagset, (1000L, 1.0), (50000L, 2.0))
    val earlyOut = QueryEngine.downsample(earlyPts,
      DownsampleSpec("1d", "sum", timezone = Some("America/Denver")), 0L, 2 * 86400)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(earlyOut === Map(-61200L -> 1.0, 25200L -> 2.0))
  }

  test("fill composes with a timezone-aligned downsample: zone-aware grid through run()") {
    import graft.filters.MatchAll
    // points on the Mar-10 (23h) and Mar-12 local days; Mar-11 is absent
    // and must zero-fill AT ITS LOCAL-MIDNIGHT LABEL (06:00 UTC) — an
    // epoch-aligned grid would both miss every real bucket and invent
    // 00:00-UTC slots
    val df = Fixtures.series("m", Map("host" -> "a"),
      (1710054000L, 1.0), (1710061200L, 2.0), (1710223200L, 4.0))
    val q = TsdbQuery(MatchAll, 1710054000L, 1710054000L + 3 * 86400 - 3600,
      downsample = Some(DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))),
      fill = Some(FillSpec(policy = "zero")))
    val got = QueryEngine.run(df, q)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1710054000L -> 3.0, 1710136800L -> 0.0, 1710223200L -> 4.0))
  }
}
