package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered conversion funnel over an event stream: for each key, the
 * earliest time it completed step 0, then the earliest step-1 event AT
 * OR AFTER that, then the earliest step-2 event at or after THAT, and
 * so on — the classic product-analytics conversion chain (view →
 * click → purchase), where a user who clicked before ever viewing does
 * not count as converted through the click.
 *
 * Shape: one filtered pass + key-keyed hash aggregate per step — the
 * fact table is scanned once per step behind a pushed-down type filter,
 * and everything after the first aggregate is per-key rows (aggregated
 * scale). The step condition (`event_ts >= previous_step_ts`) lives
 * inside a conditional `min`, so non-converting keys survive with NULL
 * step times instead of dropping — funnel DROP-OFF is part of the
 * result, not a casualty of an inner join.
 */
object Funnel {

  /** One row per key that completed step 0: `step0_ts … stepN_ts`
   *  (NULL once the chain breaks) plus `depth` — how many steps
   *  completed in order. */
  /** `maxGapSec`: when set, each step must additionally occur WITHIN
   *  that many seconds of the previous completed step (the "convert
   *  within an hour" product constraint) — a later event outside the
   *  window breaks the chain exactly like a missing one. */
  def conversion(ev: DataFrame, key: Column, typeCol: Column, tsCol: Column,
      steps: Seq[String], maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(maxGapSec.forall(_ > 0), s"maxGapSec must be positive: $maxGapSec")
    var acc = ev.filter(typeCol === steps.head)
      .groupBy(key.as("key")).agg(min(tsCol).as("step0_ts"))
    steps.zipWithIndex.tail.foreach { case (st, i) =>
      val prev = col(s"step${i - 1}_ts")
      val inWindow = maxGapSec
        .map(g => col("__t") >= prev && col("__t") <= prev + lit(g))
        .getOrElse(col("__t") >= prev)
      val nxt = ev.filter(typeCol === st).select(key.as("key"), tsCol.as("__t"))
      acc = acc.join(nxt, Seq("key"), "left")
        .groupBy(col("key") +: (0 until i).map(j => col(s"step${j}_ts")): _*)
        .agg(min(when(inWindow, col("__t"))).as(s"step${i}_ts"))
    }
    val depth = steps.indices
      .map(i => when(col(s"step${i}_ts").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("depth", depth)
  }
}
