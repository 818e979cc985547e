package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event index write / upsert (S9, R7) — the Spark-native counterpart of
 * the reference's Lucene writer semantics
 * (events-lucene/.../LuceneWriter.java:104-232 `index`/`update`/
 * `doUpdate`/`updateParent`):
 *
 *  - a document id is the hash of identity fields (EventWriter.java:40-52);
 *  - re-indexing the same id *updates* the stored document — ongoing
 *    events keep being upserted until they close (R7);
 *  - child events link to their parent via parent id; the reference
 *    updates the parent's childId list, we expose the equivalent join.
 *
 * Storage is an append-only version log; [[current]] resolves
 * last-writer-wins per doc id with a ranked window — the same
 * log-structured pattern as the points lake's series/latest logs, which
 * is how immutable-file storage expresses upsert at scale (a periodic
 * [[compact]] bounds read amplification).
 */
object EventsStore {

  /** Append a batch of (possibly re-indexed) event docs to the log.
   *  `version` is the writer's monotonic sequence — arrival order. */
  def append(batch: DataFrame, storeDir: String): Unit =
    batch.write.mode("append").parquet(s"$storeDir/events_log")

  def log(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/events_log")

  /** The live view: one row per doc id, the latest version winning —
   *  the reference's update-in-place, replayed over the log. */
  def current(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Parent/child linking: attach each child's id and title to its
   *  parent row (the reference's updateParent writes childIds into the
   *  parent doc; the join is the declarative equivalent). */
  def withChildren(current: DataFrame): DataFrame = {
    val children = current
      .filter(col("parent_id").isNotNull)
      .groupBy(col("parent_id").as("doc_id"))
      .agg(sort_array(collect_list(col("doc_id"))).as("child_ids"),
        count(lit(1)).as("n_children"))
    current.join(children, Seq("doc_id"), "left")
      .withColumn("n_children", coalesce(col("n_children"), lit(0L)))
  }

  /** Rewrite the log to its resolved state (one version per doc). */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val resolved = current(log(spark, storeDir)).cache()
    try {
      resolved.write.mode("overwrite").parquet(s"$storeDir/events_log_compact")
      val dst = new java.io.File(s"$storeDir/events_log")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dst)
      if (!new java.io.File(s"$storeDir/events_log_compact").renameTo(dst))
        throw new java.io.IOException("compact rename failed")
    } finally resolved.unpersist()
  }
}
