package graft.streaming

import graft.core.Intervals
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** A point row as the stateful operators consume it. */
final case class PointRow(
    series_id: Long, metric: String, tags: Map[String, String],
    ts: Long, value: Double, seq: Long)

/** Per-series last-write state carried across micro-batches. */
final case class LatestState(last_ts: Long, last_seq: Long, last_value: Double)

/** The updated latest row a batch emits for a series. */
final case class LatestUpdate(
    series_id: Long, metric: String, tags: Map[String, String],
    last_ts: Long, last_value: Double)

/**
 * Spark-native continuous operators over the points stream — the
 * Structured Streaming state/window surfaces, complementing the
 * foreachBatch lake pipeline ([[IngestJob]]):
 *
 *  - [[latestByState]]: the reference's in-memory per-series last-value
 *    tracking (core/.../core/TimeSeriesShard.java:853-959 keeps the live
 *    tail of every series on heap) as `groupByKey(series).
 *    mapGroupsWithState` — state is exactly one (ts, seq, value) triple
 *    per series, Spark's state store handles persistence/recovery, and
 *    each micro-batch emits the updated latest rows. Same
 *    last-write-wins order ((ts, seq) max) as QueryEngine.dedupe and the
 *    latest-log fold, so all three A18 paths agree.
 *  - [[windowedDownsample]]: the ingest-time interval aggregation
 *    (core/.../core/downsample/DownSampler.java:32-56) as an event-time
 *    window aggregate with a watermark: late points inside the watermark
 *    delay still land in their window; a window finalizes (append mode)
 *    once the watermark passes its end — the streaming analog of a
 *    segment flush.
 *
 * Both run on an unbounded stream with state bounded by |series| (plus
 * open windows), which is the property that matters at 100 TB/day: no
 * per-point state, no unbounded buffers.
 */
object StreamOps {

  /** Streaming A18: continuously-maintained per-series latest value. Use
   *  `outputMode("update")`; each batch emits only series that changed. */
  def latestByState(points: DataFrame): Dataset[LatestUpdate] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("series_id"), col("metric"), col("tags"),
        col("ts"), col("value"), col("seq"))
      .as[PointRow]
      .groupByKey(_.series_id)
      .mapGroupsWithState[LatestState, LatestUpdate](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[PointRow], state: GroupState[LatestState]) =>
          var cur = state.getOption.getOrElse(LatestState(Long.MinValue, Long.MinValue, Double.NaN))
          var repr: PointRow = null
          rows.foreach { p =>
            repr = p
            if (p.ts > cur.last_ts || (p.ts == cur.last_ts && p.seq > cur.last_seq))
              cur = LatestState(p.ts, p.seq, p.value)
          }
          state.update(cur)
          LatestUpdate(repr.series_id, repr.metric, repr.tags, cur.last_ts, cur.last_value)
      }
  }

  /** Streaming downsample: event-time tumbling windows + watermark. Use
   *  `outputMode("append")`; a window row is emitted exactly once, when
   *  the watermark passes its end — and it carries the full A10 composite
   *  (sum/cnt/min/max/last/sumsq, [[graft.rollup.Rollup.build]]'s column
   *  vocabulary, same NaN-as-null convention and (ts, seq)
   *  last-write-wins `last`), so in a pure-streaming deployment this
   *  operator can feed the rollup table directly: the segment flush
   *  becomes `writeStream.partitionBy(segment_start)` over these rows.
   *  Two caveats vs the lake-path flush (which recomputes segments from
   *  the deduped lake): a point for an already-finalized window is
   *  silently dropped by the watermark (the deployment chooses lateness
   *  tolerance via `watermarkDelay`), and a re-sent (series, ts)
   *  duplicate double-counts here — streaming last-write-wins dedupe
   *  isn't expressible with built-in operators
   *  (`dropDuplicatesWithinWatermark` keeps the FIRST arrival, the
   *  reference keeps the last), so exactly-once producers are assumed on
   *  this path. */
  def windowedDownsample(points: DataFrame, interval: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val sec = Intervals.toSeconds(interval)
    val v = when(isnan(col("value")), lit(null)).otherwise(col("value"))
    points
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withColumn("__v", v)
      .withColumn("__tj", to_json(col("tags")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("series_id"), col("metric"), col("__tj"),
        window(col("event_time"), s"$sec seconds"))
      .agg(
        sum(col("__v")).as("sum"),
        count(col("__v")).as("cnt"),
        min(col("__v")).as("min"),
        max(col("__v")).as("max"),
        max_by(col("__v"), when(col("__v").isNotNull, struct(col("ts"), col("seq")))).as("last"),
        sum(col("__v") * col("__v")).as("sumsq"))
      .select(col("series_id"), col("metric"),
        from_json(col("__tj"), graft.core.TagsJson.MapSchema).as("tags"),
        unix_timestamp(col("window.start")).as("bucket_ts"),
        col("sum"), col("cnt"), col("min"), col("max"), col("last"), col("sumsq"))
  }
}
