package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cohort retention: keys are cohorted by the epoch-day of their FIRST
 * event, and each later active day contributes to that cohort's
 * day-k retention count — the analytics-warehouse complement of the
 * funnel and sessionization nodes.
 *
 * Shape: one hash aggregate builds the per-key cohort day (|keys|
 * rows), a key-keyed equi-join tags every event with its key's cohort
 * (both sides hash-partition by key — no broadcast needed at any key
 * cardinality), and a distinct-then-count pair of aggregates collapses
 * to (cohort_day, k) cells. Everything after the first aggregate is
 * per-key or per-cell rows; day arithmetic is exact integer epoch-day
 * division (no timezone or calendar dependence in either engine).
 */
object Retention {

  /** One row per (cohort_day, day_k) with the distinct keys active
   *  exactly k days after their cohort day (k = 0 is the cohort size
   *  row, since the first event is on the cohort day itself).
   *
   *  The epoch-day is a FLOOR division (DuckDB's `//`), not a
   *  truncation: for pre-1970 timestamps floor(-1/86400) = -1 while a
   *  double-division-then-cast truncates to 0. floor over the double
   *  quotient is exact here — epoch seconds sit far below 2^53, and
   *  the quotient's ulp (~1e-11) is ~6 orders under the 1/86400 gap to
   *  the nearest integer boundary. */
  def cohorts(ev: DataFrame, key: Column, tsCol: Column): DataFrame = {
    val days = ev.select(key.as("key"),
      floor(tsCol.cast("long") / lit(86400.0)).cast("long").as("day"))
    val cohort = days.groupBy(col("key")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "key")
      .select(col("key"), col("cohort_day"), (col("day") - col("cohort_day")).as("day_k"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_k"))
      .agg(count(lit(1)).as("n_active"))
  }
}
