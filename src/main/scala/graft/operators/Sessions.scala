package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time sessionization: each key's events collapse into sessions
 * separated by at least `gapSec` of silence — the classic
 * user-activity / burst-detection analytic over the events domain.
 *
 * Built on Spark's `session_window` (dynamic-gap windows merged inside
 * the aggregate — one hash/merge aggregate keyed by (key, window), no
 * self-join, no per-key sort in the plan beyond the aggregate's own
 * exchange). The same expression works under Structured Streaming with
 * a watermark, so the batch shape here is the replayable restatement of
 * the streaming deployment.
 *
 * Session identity in the output is the observable (first, last) event
 * times, not Spark's internal window end — keeping the result
 * engine-neutral: a SQL gaps-and-islands restatement (break when
 * ts - prev > gap — session_window merges an event landing at exactly
 * last+gap, the inclusive boundary the spec pins — with cumulative-sum
 * session ids) produces identical rows, which is what the oracle does.
 */
object Sessions {

  private def aggregate(grouped: org.apache.spark.sql.RelationalGroupedDataset,
      tsCol: Column, valueCol: Column): DataFrame =
    grouped.agg(
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(valueCol), 4).as("sum_value"))
      .drop("session_window")

  def sessionize(ev: DataFrame, key: Column, tsCol: Column, valueCol: Column,
      gapSec: Long): DataFrame = {
    require(gapSec >= 1, s"session gap must be >= 1s, got $gapSec")
    aggregate(
      ev.groupBy(key.as("key"), session_window(to_timestamp(tsCol), s"$gapSec seconds")),
      tsCol, valueCol)
  }

  /** Streaming face of [[sessionize]]: the same (key, session_window)
   *  merge aggregate over a watermarked stream — sessions finalize and
   *  emit (append mode) once the watermark passes their window end
   *  (last event + gap), i.e. once no in-delay event can extend them.
   *  State per key is the open sessions only; the watermark bounds it.
   *  Finalized rows are bit-identical to the batch restatement over the
   *  same events — the oracle the streamed query shares. */
  def sessionizeStream(ev: DataFrame, key: Column, tsCol: Column, valueCol: Column,
      gapSec: Long, delay: String): DataFrame = {
    require(gapSec >= 1, s"session gap must be >= 1s, got $gapSec")
    val withEvt = ev.withColumn("__evt", to_timestamp(tsCol))
      .withWatermark("__evt", delay)
    aggregate(
      withEvt.groupBy(key.as("key"), session_window(col("__evt"), s"$gapSec seconds")),
      tsCol, valueCol).drop("__evt")
  }
}
