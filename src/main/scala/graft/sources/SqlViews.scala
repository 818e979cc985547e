package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * ANSI-SQL access to the engine's tables: register the lake as temp
 * views so plain `spark.sql` text runs against the same relations the
 * DataFrame surface reads. Catalyst inlines temp views, so a SQL query
 * and its DataFrame twin compile to the SAME physical plan — pushdown,
 * pruning, and whole-stage codegen included; SQL is a front end here,
 * never a second engine. The engine's custom functions (md5prefix28,
 * vector dot product) are session-registered by GraftExtensions, so SQL
 * text can call them directly.
 *
 * The views expose the engine's RAW relations; query semantics that are
 * contracts of the engine (last-write-wins dedupe, NaN-as-missing) must
 * be stated in the SQL — q_sql_ds_sum in the declared-query suite shows
 * the canonical phrasing and hash-matches the DataFrame path's oracle.
 */
object SqlViews {

  /** Point rows (metric, tags, ts, value, seq, series_id,
   *  segment_start) as `graft_points`. */
  def register(spark: SparkSession, dir: String): Unit =
    TsdbViews.points(spark, dir).createOrReplaceTempView("graft_points")
}
