package graft.streaming

import graft.core.TsdbSchema
import graft.sources.TsdbViews
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming ingest (S1-S3, R2-R3, R5-R6): the Structured Streaming
 * equivalent of the reference's Kafka→shard write path
 * (core/.../core/BaseStorage.java:100-144 admission,
 * TimeSeriesShard.java:853-959 addTimeSeries, TSFlusherImp flushes).
 *
 * Shape: `readStream` (file source here; a Kafka source is the same plan
 * with a different format) → events→points mapping → `foreachBatch`:
 *
 *  - **admission** (R2): points older than retention relative to the
 *    batch's high-water mark, or absurdly in the future, are dropped —
 *    the reference's isDelayed/isEarly checks.
 *  - **append** points to the lake, `partitionBy("segment_start")` — the
 *    2h-aligned partition IS the reference's segment window; old-window
 *    data lands in old partitions (R4: out-of-order tolerated, ordering
 *    irrelevant in an append lake).
 *  - **series_dim upsert** (S3): per-batch series summaries appended to a
 *    log; [[seriesDim]] folds the log (log-structured merge — the
 *    parquet-level answer to the reference's in-place meta upsert).
 *  - **latest upsert**: per-batch per-series last (ts, value) appended;
 *    [[latest]] folds the log, so a last-value query reads
 *    O(|series| × batches) log rows, never the fact table (A18 at scale).
 *  - **retention purge** (R5): [[purge]] drops whole expired
 *    segment_start partitions — the partition-drop analog of the
 *    reference's PurgeJob freeing expired segments.
 *  - [[compact]] (R6-ish): rewrites the logs to one snapshot row per
 *    series, bounding read amplification — the meta-flush analog.
 *
 * Duplicate (series, ts) points may exist across batches (R3); readers
 * dedupe by the `seq` ingest order exactly like the batch path
 * (QueryEngine.dedupe) — last-write-wins.
 */
object IngestJob {

  final case class Config(
      lakeDir: String,
      checkpointDir: String,
      retentionSec: Long = TsdbSchema.RetentionSeconds,
      maxFutureSec: Long = 3600)

  def pointsPath(cfg: Config): String = s"${cfg.lakeDir}/points"
  def seriesLogPath(cfg: Config): String = s"${cfg.lakeDir}/series_log"
  def latestLogPath(cfg: Config): String = s"${cfg.lakeDir}/latest_log"

  /** Per-batch ingest accounting (the reference logs dropped-point
   *  counters at admission; we surface them to the caller). */
  final case class BatchStats(total: Long, admitted: Long, highWaterMark: Long) {
    def dropped: Long = total - admitted
  }

  /** One micro-batch: admission + the three appends. The points append
   *  goes through the sink strategy surface (P4) — default is the
   *  segment-partitioned parquet lake. Returns admission stats. */
  def processBatch(batch: DataFrame, cfg: Config,
      sink: Option[graft.sinks.PointsSink] = None): BatchStats = {
    if (batch.isEmpty) return BatchStats(0, 0, Long.MinValue)
    val hwm = batch.agg(max(col("ts"))).head.getLong(0)
    val admitted = batch
      .filter(col("ts") > lit(hwm - cfg.retentionSec) && col("ts") <= lit(hwm + cfg.maxFutureSec))
      .cache()
    try {
      sink.getOrElse(new graft.sinks.PartitionedParquetSink(pointsPath(cfg)))
        .append(admitted)
      val withTj = admitted.withColumn("__tj", to_json(col("tags")))
      withTj
        .groupBy(col("series_id"), col("metric"), col("__tj"))
        .agg(min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
        .withColumn("tags", from_json(col("__tj"), graft.core.TagsJson.MapSchema))
        .select("series_id", "metric", "tags", "first_seen", "last_seen")
        .write.mode("append").parquet(seriesLogPath(cfg))
      withTj
        .groupBy(col("series_id"), col("metric"), col("__tj"))
        .agg(max(col("ts")).as("last_ts"),
          max_by(col("value"), struct(col("ts"), col("seq"))).as("last_value"))
        .withColumn("tags", from_json(col("__tj"), graft.core.TagsJson.MapSchema))
        .select("series_id", "metric", "tags", "last_ts", "last_value")
        .write.mode("append").parquet(latestLogPath(cfg))
      BatchStats(batch.count(), admitted.count(), hwm)
    } finally admitted.unpersist()
  }

  /** Start the stream over a directory of events parquet files. */
  def run(spark: SparkSession, sourceDir: String, cfg: Config,
      availableNow: Boolean = true): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val writer = TsdbViews.pointsFromEvents(stream).writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((b: DataFrame, _: Long) => { processBatch(b, cfg); () })
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Synthetic data-gen ingest (the reference's DATA_GEN input mode,
   *  AuraMetricsService InputMode): Spark's rate source drives a
   *  deterministic metric/tag mapping through the exact same batch
   *  pipeline as file/Kafka input. */
  def runDataGen(spark: SparkSession, cfg: Config, rowsPerSecond: Int = 1000,
      numSeries: Int = 100): StreamingQuery = {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
    val points = stream.select(
        concat(lit("gen.metric."), (col("value") % 5).cast("string")).as("metric"),
        map(lit("series"), (col("value") % numSeries).cast("string")).as("tags"),
        (col("value") / lit(numSeries)).cast("long").as("ts"), // dense synthetic clock
        (col("value") % 1000).cast("double").as("value"),
        col("value").as("seq"))
      .withColumn("series_id", graft.core.SeriesId.seriesId(col("metric"), col("tags")))
      .withColumn("segment_start", graft.core.SeriesId.segmentStart(col("ts")))
    points.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((b: DataFrame, _: Long) => { processBatch(b, cfg); () })
      .start()
  }

  /** Streamed lake views. */
  def points(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(pointsPath(cfg))

  def seriesDim(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(seriesLogPath(cfg))
      .withColumn("__tj", to_json(col("tags")))
      .groupBy(col("series_id"), col("metric"), col("__tj"))
      .agg(min(col("first_seen")).as("first_seen"), max(col("last_seen")).as("last_seen"))
      .withColumn("tags", from_json(col("__tj"), graft.core.TagsJson.MapSchema))
      .withColumn("tag_count", size(map_keys(col("tags"))))
      .select("series_id", "metric", "tags", "tag_count", "first_seen", "last_seen")

  def latest(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(latestLogPath(cfg))
      .withColumn("__tj", to_json(col("tags")))
      .groupBy(col("series_id"), col("metric"), col("__tj"))
      .agg(max(col("last_ts")).as("last_ts"),
        max_by(col("last_value"), col("last_ts")).as("last_value"))
      .withColumn("tags", from_json(col("__tj"), graft.core.TagsJson.MapSchema))
      .select("series_id", "metric", "tags", "last_ts", "last_value")

  /** R5: drop whole expired segment partitions (cheap file-level purge). */
  def purge(cfg: Config, cutoffSec: Long): Seq[Long] = {
    val root = new java.io.File(pointsPath(cfg))
    val expired = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("segment_start="))
      .filter(_.getName.stripPrefix("segment_start=").toLong < cutoffSec)
    expired.foreach(deleteRecursively)
    expired.map(_.getName.stripPrefix("segment_start=").toLong).toSeq.sorted
  }

  /** Compact the series/latest logs to one row per series. */
  def compact(spark: SparkSession, cfg: Config): Unit = {
    val dim = seriesDim(spark, cfg).cache()
    val lat = latest(spark, cfg).cache()
    try {
      dim.select("series_id", "metric", "tags", "first_seen", "last_seen")
        .write.mode("overwrite").parquet(s"${cfg.lakeDir}/series_log_compact")
      lat.write.mode("overwrite").parquet(s"${cfg.lakeDir}/latest_log_compact")
      replaceDir(s"${cfg.lakeDir}/series_log_compact", seriesLogPath(cfg))
      replaceDir(s"${cfg.lakeDir}/latest_log_compact", latestLogPath(cfg))
    } finally { dim.unpersist(); lat.unpersist() }
  }

  private def replaceDir(src: String, dst: String): Unit = {
    deleteRecursively(new java.io.File(dst))
    if (!new java.io.File(src).renameTo(new java.io.File(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
