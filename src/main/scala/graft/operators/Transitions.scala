package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-type transition matrix: first-order Markov statistics over
 * per-entity event streams — for each ordered pair (prev, next), how
 * often next immediately follows prev within one entity's stream, and
 * the conditional probability P(next | prev). The behavioral-analytics
 * sibling of [[Sessions]] / [[Funnel]] / [[Retention]]: funnels test
 * ONE hypothesized path; the transition matrix surfaces ALL observed
 * paths (where users actually go after a view), which is how the
 * funnel hypothesis gets chosen in the first place.
 *
 * Determinism: events order by (ts, tiebreak) within an entity — the
 * tiebreak (ingest sequence) totally orders same-second events, so
 * both engines chain identical pairs (the Sessions ordering
 * discipline).
 *
 * Plan shape at 100 TB: one window partitioned per entity (the
 * sessionize shape — a per-key sort, never a global one), one
 * partial+final count over |event types|² keys, and the conditional
 * division windows over that ≤ |types|² aggregated relation. Nothing
 * fact-sized shuffles twice.
 *
 * CARDINALITY CONTRACT: the output is |types|² BY DESIGN — correct for
 * event-type domains (dozens of types), quietly explosive if a caller
 * keys on a high-cardinality column (URL, user id, session id). For
 * such domains pass `maxTypes`: types are ranked by total count
 * (ties break on the type string) and everything past the head is
 * bucketed to [[OtherType]] BEFORE the lag chain, so the matrix is
 * bounded at (maxTypes+1)² whatever the domain — the same
 * head-restriction discipline as the PMI bigram space
 * (TextAnalysis.pmi's headVocab). The bucketing is semantic, not just
 * a cap: a __other row means "a transition involving a tail type",
 * aggregated across all tail types.
 */
object Transitions {

  /** The bucket label tail types collapse to under `maxTypes`. */
  val OtherType = "__other"

  /** (prev_type, next_type, n, p) — n immediate successions, p the
   *  row-conditional probability (rounded 4, the engine convention).
   *
   *  `maxTypes = Some(h)`: head-restrict the type domain to the top-h
   *  types by count before chaining (see the cardinality contract
   *  above). The head table is ≤ h rows (TakeOrderedAndProject), so
   *  the remap is one broadcast probe per fact row — the count pass is
   *  one extra map-side-combining aggregate, paid only when asked. */
  def matrix(events: DataFrame, key: Column, eventType: Column, ts: Column,
      tiebreak: Column, maxTypes: Option[Int] = None): DataFrame = {
    maxTypes.foreach(h => require(h >= 1, s"maxTypes must be >= 1, got $h"))
    val typed = events
      .select(key.as("__k"), eventType.as("__t"), ts.as("__ts"), tiebreak.as("__tb"))
    val bucketed = maxTypes.fold(typed) { h =>
      // null types can never match the equi-join below, so letting one
      // rank into the head would waste a slot and evict a real type —
      // they bucket to [[OtherType]] like any tail type. (Precondition:
      // no REAL type is literally named [[OtherType]], or it merges with
      // the bucket — the PMI head-vocab caveat.)
      val head = typed.filter(col("__t").isNotNull)
        .groupBy(col("__t")).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col("__t").asc).limit(h)
        .select(col("__t"), lit(true).as("__head"))
      typed.join(broadcast(head), Seq("__t"), "left")
        .withColumn("__t",
          when(col("__head").isNotNull, col("__t")).otherwise(lit(OtherType)))
        .drop("__head")
    }
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts").asc, col("__tb").asc)
    fromPairs(bucketed
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__prev").as("prev_type"), col("__t").as("next_type")))
  }

  /** The aggregation stage alone, over a (prev_type, next_type) pair
   *  relation — shared by the batch lag chain above and the finalized
   *  output of [[graft.streaming.StreamOps.transitionsStream]], so the
   *  two paths can share one oracle. */
  def fromPairs(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n") / sum(col("n")).over(Window.partitionBy(col("prev_type"))), 4))
}
