package graft.core

import org.apache.spark.sql.types._

/**
 * Canonical schemas of the graft TSDB lake.
 *
 * Data model follows the reference's tagged-time-series abstraction
 * (metric name + tag map + epoch-second timestamp + double value; cf.
 * reference core/TimeSeriesShard.java:853-959 `addTimeSeries` which widens
 * all values to double and stores epoch seconds as int). Timestamps are
 * epoch **seconds** (LongType) throughout so that bucket arithmetic is
 * exact integer math at any scale.
 *
 * `seq` is the ingest sequence used for last-write-wins dedupe of
 * duplicate (series, ts) points (cf. reference
 * AuraMetricsNumericArrayIterator.java:721-746 `values[ts % len] = value`
 * — last *arrival* wins; we make the arrival order an explicit column).
 */
object TsdbSchema {
  val SegmentSeconds: Long = 2L * 3600 // reference default: 2h segments (ShardConfig.java:35)
  val RetentionSeconds: Long = 24L * 3600 // reference default: 24h retention (ShardConfig.java:36)

  val points: StructType = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("series_id", LongType, nullable = false),
    StructField("segment_start", LongType, nullable = false)
  ))

  val seriesDim: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("tag_count", IntegerType, nullable = false),
    StructField("first_seen", LongType, nullable = false),
    StructField("last_seen", LongType, nullable = false)
  ))

  /** Ingest-time rollup table (reference core/downsample/DownSampler.java:32-56:
   *  composite avg/sum/count/min/max/last/sumofsquare per interval). */
  val rollup: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("bucket_ts", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = true),
    StructField("cnt", LongType, nullable = false),
    StructField("min", DoubleType, nullable = true),
    StructField("max", DoubleType, nullable = true),
    StructField("last", DoubleType, nullable = true),
    StructField("sumsq", DoubleType, nullable = true)
  ))
}

/** A single ingested data point (pre-hashing). */
case class DataPoint(
    metric: String,
    tags: Map[String, String],
    ts: Long,
    value: Double,
    seq: Long)
