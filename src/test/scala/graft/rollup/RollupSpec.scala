package graft.rollup

import graft.{Fixtures, TestSpark}
import graft.query.DownsampleSpec
import org.scalatest.funsuite.AnyFunSuite

/** Rollup build + routing (A10/A14), including the plan-level proof that
 *  a routed query scans the rollup table, not raw points. */
class RollupSpec extends AnyFunSuite {

  private val tagset = Map("host" -> "a")
  // 4 points across two 1h buckets inside one day
  private val pts = Fixtures.series("m", tagset,
    (0L, 1.0), (600L, 3.0), (3600L, 10.0), (4200L, 2.0))

  test("rollup stores the composite aggregates per interval (A10)") {
    val r = Rollup.build(pts, "1h").collect()
      .map(x => x.getAs[Long]("bucket_ts") ->
        (x.getAs[Double]("sum"), x.getAs[Long]("cnt"), x.getAs[Double]("min"),
          x.getAs[Double]("max"), x.getAs[Double]("last"), x.getAs[Double]("sumsq"))).toMap
    assert(r(0L) === ((4.0, 2L, 1.0, 3.0, 3.0, 10.0)))
    assert(r(3600L) === ((12.0, 2L, 2.0, 10.0, 2.0, 104.0)))
  }

  test("routing decision mirrors the reference's divisibility rule (A14)") {
    assert(Rollup.canServe(DownsampleSpec("1d", "sum"), "1h"))
    assert(Rollup.canServe(DownsampleSpec("2h", "avg"), "1h"))
    assert(!Rollup.canServe(DownsampleSpec("90m", "sum"), "1h"), "5400 % 3600 != 0")
    assert(!Rollup.canServe(DownsampleSpec("1d", "median"), "1h"), "median is not stored")
    assert(!Rollup.canServe(
      DownsampleSpec("1d", "sum", timezone = Some("America/Denver")), "1h"),
      "tz-aligned buckets start at local midnight, not the stored UTC " +
        "boundaries - must route to raw, never silently re-bucket to UTC")
    assert(!Rollup.canServe(DownsampleSpec("1d", "sum", runAll = true), "1h"))
    assert(!Rollup.canServe(DownsampleSpec("1d", "sum", infectiousNan = true), "1h"))
  }

  test("canServeTz: zone offsets and transitions must land on rollup boundaries") {
    val denver = DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))
    val kolkata = DownsampleSpec("1d", "sum", timezone = Some("Asia/Kolkata"))
    // Jan 2024, no transitions: Denver -7h on a 1h rollup serves
    assert(Rollup.canServeTz(denver, "1h", 1704412800L, 1706140800L))
    // +5:30 is not a whole hour: a 1h rollup row straddles Kolkata's
    // local midnight; a 30m rollup's rows do not
    assert(!Rollup.canServeTz(kolkata, "1h", 1704412800L, 1706140800L))
    assert(Rollup.canServeTz(kolkata, "30m", 1704412800L, 1706140800L))
    // the 2024 US spring-forward transition (1710061200) is a whole
    // hour — still servable across it
    assert(Rollup.canServeTz(denver, "1h", 1710028800L, 1710288000L))
    // unaligned query edges clip differently on the two paths: reject
    assert(!Rollup.canServeTz(denver, "1h", 1704412800L + 60, 1706140800L))
    // a tz-free spec is not this path's business
    assert(!Rollup.canServeTz(DownsampleSpec("1d", "sum"), "1h",
      1704412800L, 1706140800L))
  }

  test("tz rollup serving equals the raw tz downsample across a DST transition") {
    // points across the 23h spring-forward Denver day + the next day
    val dayStart = 1710054000L // Mar 10 2024 00:00 MST
    val p = Fixtures.series("m", tagset,
      (dayStart, 1.0), // local midnight
      (1710061199L, 2.0), // 01:59:59 MST, last pre-transition second
      (1710061200L, 4.0), // 03:00:00 MDT, the skipped-hour boundary
      (1710136799L, 8.0), // 23:59:59 MDT, last second of the 23h day
      (1710136800L, 16.0)) // next local midnight
    val spec = DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))
    val (start, end) = (dayStart, dayStart + 2 * 86400)
    val raw = graft.query.QueryEngine.downsample(p, spec, start, end)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = Rollup.serve(Rollup.build(p, "1h"), spec, start, end)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(raw === Map(dayStart -> 15.0, 1710136800L -> 16.0))
    assert(served === raw,
      "stored hourly composites re-bucketed on the zone expression must " +
        "reproduce the per-point local-midnight grouping exactly")
    // and the routed path picks the rollup here (full-serve, legal range)
    val routed = Rollup.downsampleRouted(
      p.withColumn("segment_start",
        org.apache.spark.sql.functions.col("ts") -
          org.apache.spark.sql.functions.col("ts") %
            graft.core.TsdbSchema.SegmentSeconds),
      Rollup.build(p, "1h"), "1h", spec, start, end)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(routed === raw)
  }

  test("served results equal the direct computation") {
    val rollup = Rollup.build(pts, "1h")
    for (agg <- Seq("sum", "count", "min", "max", "avg", "last")) {
      val served = Rollup.serve(rollup, DownsampleSpec("2h", agg), 0, 7200)
        .select("bucket_ts", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val direct = graft.query.QueryEngine
        .downsample(pts, DownsampleSpec("2h", agg), 0, 7200)
        .select("bucket_ts", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(served === direct, s"agg=$agg")
    }
  }

  test("dev serves from the stored moments, composing across sub-intervals") {
    // 2h query over 1h rollup rows: total sumsq/sum/cnt ADD across the
    // two sub-buckets, so the served stddev must equal the direct
    // stddev over the raw values {1,3,10,2} (moment formula vs
    // Welford-style accumulation agree far below 1e-9 here)
    val rollup = Rollup.build(pts, "1h")
    val served = Rollup.serve(rollup, DownsampleSpec("2h", "dev"), 0, 7200)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = graft.query.QueryEngine
      .downsample(pts, DownsampleSpec("2h", "dev"), 0, 7200)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served.keySet === direct.keySet)
    served.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-9, s"bucket $k") }
    // a single-point bucket is NULL (sample stddev undefined), not 0 or NaN;
    // and a constant-valued bucket is exactly 0, not NaN from a tiny
    // negative variance
    val single = Fixtures.series("m", tagset, (0L, 5.0), (3600L, 7.0), (3700L, 7.0))
    val r1 = Rollup.serve(Rollup.build(single, "1h"), DownsampleSpec("1h", "dev"), 0, 7200)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(r1(0L).isEmpty)
    assert(r1(3600L) === Some(0.0))
    assert(Rollup.canServe(DownsampleSpec("1d", "dev"), "1h"))
  }

  test("sampled percentile serves losslessly from the stored sample + presence pair") {
    // membership is a pure function of ts, so serving from the stored
    // sample must BIT-equal the direct sampled aggregator over raw
    // points — including presence rows whose sample is empty (NULL)
    import org.apache.spark.sql.functions._
    val rows = (0L until 40L).map(t => (t, (t * 7 % 13).toDouble)) ++
      Seq((3600L, 5.0)) // second bucket: likely no sampled ts → NULL row
    val df = Fixtures.series("m", tagset, rows: _*)
    graft.query.Aggregators.register("p95s_spec", (v, ts, _, _) =>
      percentile(when(pmod(call_function("md5prefix28", ts.cast("string")),
        lit(4)) === 0, v), lit(0.95)))
    val direct = graft.query.QueryEngine
      .downsample(df, DownsampleSpec("1h", "p95s_spec"), 0, 7200)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val served = Rollup.servePercentileSampled(
      Rollup.build(df, "1h"), Rollup.buildSample(df, "1h", 4), "1h", 0.95, 0, 7200)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(served === direct)
    assert(served.keySet === Set(0L, 3600L)) // presence covers the unsampled bucket
    // the sample really is a strict subset
    val nSample = Rollup.buildSample(df, "1h", 4).count()
    assert(nSample > 0 && nSample < rows.size)
  }

  test("a routed query's physical plan scans the rollup table only") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    Rollup.build(pts, "1h").write.mode("overwrite").parquet(s"$dir/rollup_1h")
    val rollup = spark.read.parquet(s"$dir/rollup_1h")
    val routed = Rollup.downsampleRouted(pts, rollup, "1h", DownsampleSpec("1d", "sum"), 0, 86400)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("rollup_1h"), "must scan the rollup parquet")
    assert(!plan.contains("LocalTableScan"), "must not fall back to the raw fixture")

    val fallback = Rollup.downsampleRouted(pts, rollup, "1h", DownsampleSpec("90m", "sum"), 0, 86400)
    assert(!fallback.queryExecution.executedPlan.toString.contains("rollup_1h"),
      "non-divisible interval must route to raw points")

    // tz serving reaches the rollup scan when the range is legal...
    val tzSpec = DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))
    val tzServed = Rollup.downsampleRouted(pts, rollup, "1h", tzSpec, 0, 86400)
    assert(tzServed.queryExecution.executedPlan.toString.contains("rollup_1h"),
      "whole-hour-offset zone over an aligned range must serve from the rollup")
    // ...and falls back to raw for a fractional-hour zone
    val tzRaw = Rollup.downsampleRouted(pts, rollup, "1h",
      tzSpec.copy(timezone = Some("Asia/Kolkata")), 0, 86400)
    assert(!tzRaw.queryExecution.executedPlan.toString.contains("rollup_1h"),
      "+5:30 against a 1h rollup must route to raw")
  }

  test("rollup output conforms to the declared schema; interval vocabulary enforced") {
    val declared = graft.core.TsdbSchema.rollup.fields.map(f => f.name -> f.dataType).toMap
    val actual = Rollup.build(pts, "1h").schema.fields.map(f => f.name -> f.dataType).toMap
    for ((name, dt) <- declared)
      assert(actual.get(name).contains(dt), s"missing/mistyped rollup column $name")
    assertThrows[IllegalArgumentException](Rollup.build(pts, "7m"))
  }

  test("hybrid routing: frontier clamps, floors to query buckets, and degrades to pure raw/rollup") {
    import org.apache.spark.sql.functions._
    val p = graft.Fixtures.series("m", tagset,
      (0L, 1.0), (600L, 3.0), (7300L, 5.0), (14500L, 7.0)) // 3 segments
    val ru = Rollup.build(p, "1h")
    val spec = DownsampleSpec("2h", "sum")
    val expect = Map(0L -> 4.0, 7200L -> 5.0, 14400L -> 7.0)
    def run(rollup: org.apache.spark.sql.DataFrame, until: Long) =
      Rollup.downsampleHybrid(p, rollup, "1h", spec, 0, 21600, until)
        .collect().map(r => r.getAs[Long]("bucket_ts") -> r.getAs[Double]("value")).toMap
    // frontier past end → pure rollup; at/below start → pure raw (even
    // with an EMPTY rollup table)
    assert(run(ru, Long.MaxValue) === expect)
    assert(run(ru.limit(0), 0L) === expect)
    assert(run(ru.limit(0), -5L) === expect)
    // mid-segment frontier floors DOWN to a query-bucket boundary: with
    // the rollup missing everything >= 7200, frontier 8000 must still
    // serve bucket 7200 from raw (a ceil would silently lose it)
    assert(run(ru.filter(col("bucket_ts") < 7200), 8000L) === expect)
    // non-servable spec ignores the rollup entirely
    val fallback = Rollup.downsampleHybrid(p, ru.limit(0), "1h",
      DownsampleSpec("90m", "sum"), 0, 21600, 7200)
      .agg(sum(col("value"))).head.getDouble(0)
    assert(fallback === 16.0)
  }

  test("tz hybrid: frontier lands on a local-midnight label; closed days read the rollup, the tail reads raw") {
    import org.apache.spark.sql.functions._
    val dayStart = 1710054000L // Mar 10 2024 00:00 MST — the 23h day
    val p = Fixtures.series("m", tagset,
      (dayStart, 1.0), (1710061199L, 2.0), (1710061200L, 4.0),
      (1710136799L, 8.0), (1710136800L, 16.0))
      .withColumn("segment_start",
        col("ts") - col("ts") % graft.core.TsdbSchema.SegmentSeconds)
    val spec = DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))
    val (start, end) = (dayStart, dayStart + 2 * 86400)
    val expect = Map(dayStart -> 15.0, 1710136800L -> 16.0)
    val ru = Rollup.build(p, "1h")
    def run(rollup: org.apache.spark.sql.DataFrame, until: Long): Map[Long, Double] = {
      val rows = Rollup.downsampleHybrid(p, rollup, "1h", spec, start, end, until)
        .collect().map(r => r.getAs[Long]("bucket_ts") -> r.getAs[Double]("value"))
      assert(rows.map(_._1).distinct.length === rows.length,
        s"split double-emitted a bucket: ${rows.toSeq}")
      rows.toMap
    }
    // frontier mid-second-day → split at the Mar-11 local-midnight LABEL
    // (1710136800): poison every rollup row past it — the tail must read
    // raw, so the poison cannot surface
    val poisonTail = ru.withColumn("sum",
      when(col("bucket_ts") >= 1710136800L, lit(1e9)).otherwise(col("sum")))
    assert(run(poisonTail, 1710136800L + 7200) === expect)
    // ...and nudge every row BEFORE it to prove the closed 23h day
    // really is served from the stored composites (4 rollup rows → +4)
    val poisonHead = ru.withColumn("sum",
      when(col("bucket_ts") < 1710136800L, col("sum") + 1.0).otherwise(col("sum")))
    assert(run(poisonHead, 1710136800L + 7200)
      === Map(dayStart -> 19.0, 1710136800L -> 16.0))
    // frontier before the first closed local day → pure raw, rollup unused
    assert(run(ru.limit(0), dayStart + 3600) === expect)
    // fractional-hour zone: no legal split exists → raw end to end
    assert({
      val rows = Rollup.downsampleHybrid(p, poisonTail, "1h",
        spec.copy(timezone = Some("Asia/Kolkata")), start, end, 1710136800L + 7200)
        .agg(sum(col("value"))).head.getDouble(0)
      rows
    } === 31.0)
  }

  test("hybrid routing with an unaligned start falls back to raw (partial first bucket unservable)") {
    import org.apache.spark.sql.functions._
    val p = graft.Fixtures.series("m", tagset,
      (0L, 1.0), (600L, 3.0), (7300L, 5.0), (14500L, 7.0))
    val ru = Rollup.build(p, "1h")
    val spec = DownsampleSpec("2h", "sum")
    // start=600 is NOT a multiple of the 2h query interval: the epoch
    // rollup bucket 0 contains ts=0 (before start), so serving it from
    // the stored composite would overcount — and a start-relative
    // frontier floor (600 + k*7200) would additionally double-emit the
    // straddling bucket. The route must be pure raw and match the raw
    // engine exactly.
    val out = Rollup.downsampleHybrid(p, ru, "1h", spec, 600, 21600, 7900)
      .collect().map(r => r.getAs[Long]("bucket_ts") -> r.getAs[Double]("value"))
    assert(out.map(_._1).distinct.length === out.length, s"duplicate buckets in ${out.toSeq}")
    assert(out.toMap === Map(0L -> 3.0, 7200L -> 5.0, 14400L -> 7.0))
    val direct = graft.query.QueryEngine.downsample(
        p.filter(col("ts") >= 600 && col("ts") < 21600), spec, 600, 21600)
      .collect().map(r => r.getAs[Long]("bucket_ts") -> r.getAs[Double]("value")).toMap
    assert(out.toMap === direct)
    // and the unaligned route never touches the rollup table in the plan
    val plan = Rollup.downsampleHybrid(p, ru, "1h", spec, 600, 21600, 7900)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("sumsq"), s"rollup columns leaked into the raw plan:\n$plan")
  }

  test("dedupe strategy covers every rollup dedupe site, winners identical") {
    // overwrite at ts=600 (seq order) so a dedupe that misses it diverges;
    // the strategy switch must reach build, buildSample, AND the hybrid
    // raw tail — not just QueryEngine.run
    val spark = graft.TestSpark.spark
    val dup = graft.Fixtures.points(
      ("m", tagset, 0L, 1.0, 0L), ("m", tagset, 600L, 3.0, 1L),
      ("m", tagset, 600L, 9.0, 2L), // LWW winner
      ("m", tagset, 3600L, 10.0, 3L), ("m", tagset, 4200L, 2.0, 4L))
    def snap[A](f: => Array[A]): Array[A] = f
    def runAll(): (Set[String], Set[String], Set[String]) = {
      val b = Rollup.build(dup, "1h").collect()
        .map(r => s"${r.getAs[Long]("bucket_ts")}:${r.getAs[Double]("sum")}:${r.getAs[Double]("last")}").toSet
      val s = Rollup.buildSample(dup, "1h", mod = 1).collect()
        .map(r => s"${r.getAs[Long]("ts")}:${r.getAs[Double]("value")}").toSet
      val h = Rollup.downsampleHybrid(dup, Rollup.build(dup, "1h"), "1h",
          graft.query.DownsampleSpec("1h", "sum"), 0L, 7200L, rollupUntil = 3600L)
        .collect().map(r => s"${r.getAs[Long]("bucket_ts")}:${r.getAs[Double]("value")}").toSet
      (b, s, h)
    }
    val window = runAll()
    // bucket 0: LWW drops the overwritten 3.0, keeps 1.0 + 9.0
    assert(window._1.contains("0:10.0:9.0"), s"LWW sum/last: ${window._1}")
    try {
      spark.conf.set("spark.graft.dedupe.strategy", "hashagg")
      assert(runAll() === window, "hashagg strategy must be bit-identical at every site")
    } finally spark.conf.unset("spark.graft.dedupe.strategy")
  }
}
