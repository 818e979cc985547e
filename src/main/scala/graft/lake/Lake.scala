package graft.lake

import graft.filters.SeriesFilter
import graft.sources.TsdbViews
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The partitioned lake layout (S8 + J1): points materialized
 * `partitionBy("segment_start")` — the 2h-aligned partition is the
 * reference's segment window, so a time-range query prunes whole
 * partitions exactly like `getSegmentTimes` skips segments
 * (core/.../core/LongRunningStorage.java:66-120) — plus the
 * tag-predicate → series_dim → broadcast **left-semi join** scan path,
 * the Spark analog of the reference resolving series against the
 * inverted index *before* touching data
 * (core/.../core/TimeSeriesShard.java:706-716).
 *
 * At 100 TB the semi-join is the difference between evaluating a tag
 * regex on every fact row and evaluating it on the O(|series|) dimension
 * then pruning the fact scan with a broadcast hash of matching ids
 * (which parquet row-group bloom/dictionary filters can also exploit).
 */
object Lake {

  /** One-time materialization of the fact table into the partitioned
   *  layout. */
  def materialize(spark: SparkSession, sfDir: String, lakeDir: String): Unit =
    TsdbViews.points(spark, sfDir)
      .write.mode("overwrite").partitionBy("segment_start")
      .parquet(s"$lakeDir/points")

  def points(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.parquet(s"$lakeDir/points")

  /** Filter → series_dim → broadcast-semi-join → fact scan. */
  def semiJoinScan(fact: DataFrame, seriesDim: DataFrame, f: SeriesFilter): DataFrame = {
    val matched = seriesDim
      .filter(SeriesFilter.compile(f, col("metric"), col("tags")))
      .select("series_id")
    fact.join(broadcast(matched), Seq("series_id"), "left_semi")
  }
}
