package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The Structured Streaming state/window operators: per-series latest via
 *  mapGroupsWithState, windowed downsample via watermark + event-time
 *  windows. MemoryStream gives exact micro-batch boundaries. */
class StreamOpsSpec extends AnyFunSuite {

  private def pt(sid: Long, ts: Long, v: Double, seq: Long) =
    PointRow(sid, s"m$sid", Map("s" -> sid.toString), ts, v, seq)

  test("mapGroupsWithState latest: cross-batch LWW incl. duplicate-ts seq tiebreak (A18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    val q = StreamOps.latestByState(input.toDF())
      .writeStream.format("memory").queryName("latest_state")
      .outputMode("update").start()
    try {
      input.addData(pt(1, 100, 1.0, 1), pt(1, 200, 2.0, 2), pt(2, 50, 9.0, 3))
      q.processAllAvailable()
      // duplicate ts with higher seq wins; an older point changes nothing
      input.addData(pt(1, 200, 3.0, 4), pt(1, 150, 0.5, 5))
      q.processAllAvailable()
      val rows = spark.table("latest_state")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      assert(rows === Set((1L, 200L, 2.0), (2L, 50L, 9.0), (1L, 200L, 3.0)))
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS latest_state") }
  }

  test("rateStream: finalized deltas equal the batch rate; resends replace; cross-batch chaining") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    val q = StreamOps.rateStream(input.toDF(), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("rate_stream").outputMode("append").start()
    try {
      // out-of-order arrival within one batch + a resend that replaces
      input.addData(pt(1, 30, 9.0, 3), pt(1, 10, 1.0, 1), pt(1, 20, 5.0, 2),
        pt(1, 20, 3.0, 5)) // resend of ts=20 with higher seq: value 3 wins
      q.processAllAvailable()
      // watermark is still at 30-10=20: push it past everything
      input.addData(pt(1, 300, 9.0, 6)); q.processAllAvailable()
      input.addData(pt(1, 600, 9.0, 7)); q.processAllAvailable()
      val got = spark.table("rate_stream")
        .select("ts", "value").as[(Long, Double)].collect().toMap
      // deltas chain 1.0@10 → 3.0@20 → 9.0@30: (3-1)/10, (9-3)/10
      assert(got(20L) === 0.2 && got(30L) === 0.6)
      // the cross-batch delta (30 → 300) emerges once wm passes 300
      assert(got(300L) === (9.0 - 9.0) / 270.0)
      // batch restatement agrees on the finalized prefix
      val batch = graft.query.QueryEngine.rate(
        graft.query.QueryEngine.dedupe(
          Seq(pt(1, 10, 1.0, 1), pt(1, 20, 5.0, 2), pt(1, 20, 3.0, 5),
            pt(1, 30, 9.0, 3), pt(1, 300, 9.0, 6)).toDF()),
        graft.query.RateSpec())
        .select("ts", "value").as[(Long, Double)].collect().toMap
      assert(batch.forall { case (ts, v) => got(ts) === v })
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS rate_stream") }
  }

  test("transitionsStream: same-second steps chain by seq; cross-batch chaining; stragglers drop") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TransRow]
    val q = StreamOps.transitionsStream(input.toDF(), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("trans_stream").outputMode("append").start()
    try {
      // out-of-order arrival; B and C share ts=20 and must chain by seq
      input.addData(TransRow(1, "C", 20, 3), TransRow(1, "A", 10, 1),
        TransRow(1, "B", 20, 2))
      q.processAllAvailable()
      input.addData(TransRow(1, "D", 300, 6)); q.processAllAvailable()
      // a straggler behind the finalized frontier (ts=15 < 20) must drop
      input.addData(TransRow(1, "X", 15, 9)); q.processAllAvailable()
      input.addData(TransRow(1, "E", 600, 7)); q.processAllAvailable()
      val got = spark.table("trans_stream")
        .select("prev_type", "next_type").as[(String, String)].collect().toSet
      assert(got === Set(("A", "B"), ("B", "C"), ("C", "D")),
        s"chain A->B->C (seq order at ts=20) ->D; straggler X dropped: $got")
      // batch restatement over the same (non-straggler) events agrees
      val batch = graft.operators.Transitions.matrix(
        Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "C", 20L, 3L),
          (1L, "D", 300L, 6L)).toDF("u", "t", "ts", "seq"),
        col("u"), col("t"), col("ts"), col("seq"))
        .select("prev_type", "next_type").as[(String, String)].collect().toSet
      assert(batch === got)
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS trans_stream") }
  }

  test("ewmaStream: finalized buckets equal the batch movingAverage; LWW dedupe; stragglers drop") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    // 10s buckets so the test drives multiple finalizations quickly
    val q = StreamOps.ewmaStream(input.toDF(), samples = 3, alpha = 0.5,
      bucketSec = 10L, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("ewma_stream").outputMode("append").start()
    try {
      // bucket 0: points at 1, 3 + a duplicate-ts resend (seq 9 wins but
      // count is per distinct ts → 2); bucket 10: one point; bucket 30:
      // two points (bucket 20 is a GAP — skipped, not zero-filled)
      input.addData(pt(1, 1, 1.0, 1), pt(1, 3, 2.0, 2), pt(1, 3, 7.0, 9),
        pt(1, 12, 4.0, 3), pt(1, 31, 5.0, 4), pt(1, 33, 6.0, 5))
      q.processAllAvailable()
      input.addData(pt(1, 100, 0.0, 6)); q.processAllAvailable()
      input.addData(pt(1, 200, 0.0, 7)); q.processAllAvailable()
      // a straggler into the already-finalized bucket 0 must be dropped
      input.addData(pt(1, 5, 9.0, 10)); q.processAllAvailable()
      input.addData(pt(1, 300, 0.0, 8)); q.processAllAvailable()
      val got = spark.table("ewma_stream")
        .select("bucket_ts", "value").as[(Long, Double)].collect().toMap
      // counts: bucket0=2, bucket10=1, bucket30=2 → lag-chain with
      // weights (1, .5, .25) over existing buckets
      assert(got(0L) === 2.0)
      assert(got(10L) === (1.0 + 0.5 * 2.0) / 1.5)
      assert(got(30L) === (2.0 + 0.5 * 1.0 + 0.25 * 2.0) / 1.75)
      // batch restatement: downsample count → movingAverage, bit-equal
      val pts = Seq(pt(1, 1, 1.0, 1), pt(1, 3, 2.0, 2), pt(1, 3, 7.0, 9),
        pt(1, 12, 4.0, 3), pt(1, 31, 5.0, 4), pt(1, 33, 6.0, 5)).toDF()
      val batch = graft.operators.SeriesAnalytics.movingAverage(
        graft.query.QueryEngine.downsample(
          graft.query.QueryEngine.dedupe(pts),
          graft.query.DownsampleSpec("10s", "count"), 0L, 40L),
        Seq(col("series_id")), samples = 3, alpha = 0.5)
        .select("bucket_ts", "value").as[(Long, Double)].collect().toMap
      assert(batch === got.view.filterKeys(_ < 40).toMap)
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS ewma_stream") }
  }

  test("watermarked windowed downsample: full composite finalizes once per window") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    val q = StreamOps.windowedDownsample(input.toDF(), "1m", "30 seconds")
      .writeStream.format("memory").queryName("win_ds")
      .outputMode("append").start()
    try {
      // batch 1: windows [0,60) and [60,120); watermark after = 119-30 = 89.
      // The NaN point must count for nothing (A10's NaN-as-null).
      input.addData(pt(1, 10, 1.0, 1), pt(1, 50, 2.0, 2), pt(1, 119, 4.0, 3),
        pt(1, 55, Double.NaN, 9))
      q.processAllAvailable()
      // batch 2: watermark 89 finalizes window 0; ts=70 is late but within
      // the delay for the still-open window 60; ts=300 advances wm to 270
      input.addData(pt(1, 70, 8.0, 4), pt(1, 300, 16.0, 5))
      q.processAllAvailable()
      // batch 3: watermark 270 finalizes window 60 (with the late point);
      // ts=400 then advances the watermark to 370, finalizing window 300
      input.addData(pt(1, 400, 32.0, 6))
      q.processAllAvailable()
      val out = spark.table("win_ds").collect()
      // once per window: exactly one row each for windows 0, 60, 300
      assert(out.length === 3)
      val rows = out.map(r => (r.getLong(3),
        (r.getDouble(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9)))).toMap
      // (sum, cnt, min, max, last-by-(ts,seq), sumsq); 400 still open
      assert(rows === Map(
        0L -> ((3.0, 2L, 1.0, 2.0, 2.0, 5.0)),
        60L -> ((12.0, 2L, 4.0, 8.0, 4.0, 80.0)), // last = ts119 despite seq4@70
        300L -> ((16.0, 1L, 16.0, 16.0, 16.0, 256.0))))
      assert(out.forall(r => r.getAs[Map[String, String]]("tags").nonEmpty))
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS win_ds") }
  }

  test("LWW streaming downsample: out-of-order resends replace instead of double-count; " +
      "finalized windows bit-equal Rollup.build on the deduped lake") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    val q = StreamOps.windowedDownsampleLww(input.toDF(), "1m", "30 seconds")
      .writeStream.format("memory").queryName("win_lww")
      .outputMode("append").start()
    // every arrival, in order — including the duplicates the built-in
    // window path would double-count
    val arrivals = Seq(
      pt(1, 10, 1.5, 1), pt(1, 50, 2.25, 2), pt(2, 30, 7.0, 3), // batch 1
      pt(1, 50, 20.5, 5), // RESEND with changed value: must replace 2.25
      pt(1, 10, 8.8, 0), // stale resend (lower seq): must be ignored
      pt(1, 55, Double.NaN, 6), // NaN point: counts for nothing (A10)
      pt(1, 70, 4.0, 4), // batch 2
      pt(1, 500, 99.0, 7), // batch 3: advances wm to 470
      pt(9, 9999, 0.0, 9)) // batch 4: timeout pass finalizes closed windows
    try {
      input.addData(arrivals.take(3): _*); q.processAllAvailable()
      input.addData(arrivals.slice(3, 7): _*); q.processAllAvailable()
      input.addData(arrivals(7)); q.processAllAvailable()
      input.addData(arrivals(8)); q.processAllAvailable()
      val cols = Seq("series_id", "metric", "bucket_ts", "sum", "cnt", "min", "max", "last", "sumsq")
      val out = spark.table("win_lww").filter(col("bucket_ts") < 480)
      // exactly one finalized row per (series, window) despite the resends
      assert(out.groupBy("series_id", "bucket_ts").count()
        .filter(col("count") > 1).count() === 0L)
      val finalized = out.selectExpr(cols: _*).collect().toSet
      // the batch A10 build over ALL arrivals (Rollup.build dedupes the
      // lake first) must produce identical composite rows
      val ptsDf = arrivals.toDF()
        .withColumn("segment_start", graft.core.SeriesId.segmentStart(col("ts")))
      val batch = graft.rollup.Rollup.build(ptsDf, "1m")
        .filter(col("bucket_ts") < 480)
        .selectExpr(cols: _*).collect().toSet
      assert(finalized === batch)
      assert(finalized.nonEmpty)
      // the replaced value (not the sum of both sends) is what landed
      val w0 = finalized.find(t => t.getLong(0) == 1L && t.getLong(2) == 0L).get
      assert(w0.getDouble(3) === 22.0) // 1.5 + 20.5, NOT + 2.25 or 8.8
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS win_lww") }
  }

  test("LWW streaming downsample: a straggler past a finalized window is dropped, not re-emitted") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PointRow]
    val q = StreamOps.windowedDownsampleLww(input.toDF(), "1m", "30 seconds")
      .writeStream.format("memory").queryName("win_lww_late")
      .outputMode("append").start()
    try {
      input.addData(pt(1, 10, 1.0, 1)); q.processAllAvailable()
      input.addData(pt(1, 500, 2.0, 2)); q.processAllAvailable() // wm -> 470
      input.addData(pt(1, 900, 3.0, 3)); q.processAllAvailable() // closes [0,60)
      // straggler for the long-finalized window 0: must vanish silently
      input.addData(pt(1, 20, 99.0, 9)); q.processAllAvailable()
      input.addData(pt(1, 2000, 4.0, 4)); q.processAllAvailable()
      val w0 = spark.table("win_lww_late").filter(col("bucket_ts") === 0).collect()
      assert(w0.length === 1, "window 0 must emit exactly once")
      assert(w0.head.getAs[Double]("sum") === 1.0, "the straggler must not corrupt the composite")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS win_lww_late") }
  }

  test("streaming composite rows equal Rollup.build on finalized windows (pure-streaming A10 path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // no duplicate (series, ts) re-sends here: the streaming window path
    // aggregates raw arrivals (a re-sent ts would double-count — the
    // documented trade vs the lake path, which recomputes from the
    // deduped lake); equality with Rollup.build holds on clean input
    val points = Seq(
      pt(1, 10, 1.0, 1), pt(1, 50, 2.0, 2), pt(1, 119, 4.0, 3),
      pt(2, 30, 7.0, 4), pt(1, 55, 3.0, 5),
      pt(1, 500, 99.0, 6)) // advances the watermark, finalizing [0,60)/[60,120)
    val input = MemoryStream[PointRow]
    val q = StreamOps.windowedDownsample(input.toDF(), "1m", "30 seconds")
      .writeStream.format("memory").queryName("win_bridge")
      .outputMode("append").start()
    try {
      input.addData(points.take(5): _*)
      q.processAllAvailable()
      input.addData(points.drop(5): _*)
      q.processAllAvailable()
      input.addData(pt(9, 9999, 0.0, 9)) // trailing batch emits nothing new below wm
      q.processAllAvailable()
      val cols = Seq("series_id", "metric", "bucket_ts", "sum", "cnt", "min", "max", "last", "sumsq")
      val finalized = spark.table("win_bridge").filter(col("bucket_ts") < 500)
        .selectExpr(cols: _*).collect().toSet
      // the batch-side A10 build over the SAME points, restricted to the
      // finalized windows, must produce identical composite rows
      val ptsDf = points.toDF()
        .withColumn("segment_start", graft.core.SeriesId.segmentStart(col("ts")))
      val batch = graft.rollup.Rollup.build(ptsDf, "1m")
        .filter(col("bucket_ts") < 500)
        .selectExpr(cols: _*).collect().toSet
      assert(finalized === batch)
      assert(finalized.nonEmpty)
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS win_bridge") }
  }
}
