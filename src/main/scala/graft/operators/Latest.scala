package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Last-value query: most recent (timestamp, value) per matched series —
 * the reference serves this straight off the series record's
 * last-timestamp/last-value fields (TimeSeriesShard.java:761-815,
 * OffHeapTimeSeriesRecord.java:27-31).
 *
 * Spark-side this is a single partial+final `max_by` aggregate keyed by
 * series_id — map-side combine reduces each partition to one row per
 * series before the shuffle, so the exchange is O(|series|), not
 * O(|points|). At ingest the streaming job can maintain a compact
 * `latest` table with the same schema to make this O(1) per series.
 */
object Latest {
  def apply(points: DataFrame): DataFrame =
    points
      .groupBy(col("series_id"), col("metric"),
        // JSON-string grouping key keeps the plan a HashAggregate (map or
        // string agg buffers would force SortAggregate + a full sort)
        graft.core.TagsJson.key(col("tags")).as("__tj"))
      .agg(
        max(col("ts")).as("last_ts"),
        // ties on ts resolve by ingest order (seq), i.e. last-write-wins
        max_by(col("value"), struct(col("ts"), col("seq"))).as("last_value"))
      .withColumn("tags", graft.core.TagsJson.decode(col("__tj")))
      .select("series_id", "metric", "tags", "last_ts", "last_value")
}
