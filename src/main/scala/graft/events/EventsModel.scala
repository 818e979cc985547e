package graft.events

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The event-document model — the Spark-native analog of the reference's
 * event store (one JSON document per event, reference
 * events-common/.../view/Event.java:35-80 fields: namespace, source,
 * title, message, priority, start/end timestamp, ongoing, userId,
 * dimensions map), which the reference indexes into one Lucene index per
 * UTC day (events-common/.../EventWriter.java:58-68 `getIndexName`).
 *
 * Spark-side the "daily index" is a `day` partition column of one events
 * DataFrame/lake: partition pruning plays Lucene's index-selection role;
 * text search compiles to contains-regex predicates; grouping/downsample
 * are ordinary aggregates.
 *
 * The driver's synthetic `events` table is mapped onto the document
 * schema with deterministic derivations (so the DuckDB oracle can
 * restate them):
 *   namespace := event_type, source := src<user_id%4>,
 *   title := "<event_type> by user <user_id>", message := props JSON,
 *   priority := low/med/high by user_id%3,
 *   start_ts := epoch secs, end_ts := start + (event_id%7)*600,
 *   ongoing := event_id%11==0, dimensions := {user, host, colo}.
 */
object EventsModel {

  /** Searchable text fields (reference LuceneQueryBuilder.java:84-104
   *  builds the multi-field clause over the analyzed fields). */
  val SearchFields: Seq[String] = Seq("namespace", "source", "title", "message", "priority")

  def docs(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val startTs = graft.sources.TsdbViews.toEpochSeconds(ev, "ts")
    ev.select(
        col("event_id"),
        col("event_type").as("namespace"),
        concat(lit("src"), (col("user_id") % 4).cast("string")).as("source"),
        concat(col("event_type"), lit(" by user "), col("user_id").cast("string")).as("title"),
        col("props").as("message"),
        when(col("user_id") % 3 === 0, "low")
          .when(col("user_id") % 3 === 1, "med")
          .otherwise("high").as("priority"),
        startTs.as("start_ts"),
        (startTs + (col("event_id") % 7) * 600).as("end_ts"),
        (col("event_id") % 11 === 0).as("ongoing"),
        col("user_id"),
        map(
          lit("user"), col("user_id").cast("string"),
          lit("host"), concat(lit("web"), lpad((col("user_id") % 3).cast("string"), 2, "0")),
          lit("colo"), when(col("user_id") % 2 === 0, lit("den")).otherwise(lit("sjc"))
        ).as("dimensions"),
        col("value"))
      // the reference's daily-index name (EventWriter.java:58-68) becomes a
      // partition column; from_unixtime is UTC under our session tz pin
      .withColumn("day", date_format(to_timestamp(col("start_ts")), "yyyy-MM-dd"))
      // doc id: hash of identity fields (EventWriter.java:40-52)
      .withColumn("doc_id", xxhash64(col("namespace"), col("source"), col("start_ts")))
  }
}
