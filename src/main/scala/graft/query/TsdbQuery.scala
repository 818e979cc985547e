package graft.query

import graft.filters.SeriesFilter

/**
 * The query configuration ADT — models the reference's pushed-down query
 * graph (TimeShift → Rate → Downsample → GroupBy absorbed into the source
 * node, reference AuraMetricsSourceFactory.java:120-128) as one declarative
 * value that QueryEngine compiles to a single DataFrame plan.
 */

/** Temporal aggregation (downsample) spec.
 *
 * Aggregator vocabulary mirrors the reference alias table
 * (AuraMetricsNumericArrayIterator.java:159-195): sum/zimsum, avg,
 * count, min/mimmin, max/mimmax, last, plus "non-optimized" plugin
 * aggregators (median / pNN percentiles) run over buffered interval
 * values (reference :182-195, 488-532).
 */
final case class DownsampleSpec(
    interval: String,
    agg: String,
    runAll: Boolean = false, // single interval spanning the whole range (reference :199-202)
    infectiousNan: Boolean = false, // any NaN in interval => NaN result (reference :465-473)
    reportingInterval: Option[String] = None, // "reporting average": sum / dpsInInterval (reference :151-157)
    // calendar alignment (upstream DownsampleConfig.timezone): buckets
    // snap to the zone's local boundaries (local midnight for "1d"), not
    // UTC epoch multiples. DST transitions inside the range are honored
    // per-row via driver-resolved offset segments (Intervals.zoneOffsets).
    timezone: Option[String] = None
)

/** Rate (per-point derivative) spec — reference
 *  AuraMetricsNumericArrayIterator.java:432-463. */
final case class RateSpec(
    interval: String = "1s", // rate denominator unit
    counter: Boolean = false, // counter rollover semantics (reference :444-455)
    dropResets: Boolean = false, // on decrease: drop instead of rollover math
    counterMax: Double = Long.MaxValue.toDouble,
    resetValue: Double = 0, // computed rate > resetValue (>0) => 0
    deltaOnly: Boolean = false, // raw difference v - prev (reference :440-442)
    rateToCount: Boolean = false // v * min(Δt/interval, mode-of-deltas) (reference :438-440, 364-420)
)

/** Spatial (cross-series) aggregation: group by chosen tag keys' values per
 *  interval; empty keys = group-all (reference MystQueryBuilder.java:69-75). */
final case class GroupBySpec(keys: Seq[String], agg: String)

/** Sliding-window smoother over the bucketed output (the upstream TSDB
 *  3.x sliding-window query node — the reference repo holds only the
 *  storage source whose results feed it): each bucket's value becomes
 *  `agg` over the trailing `buckets` buckets of its own series/group. */
final case class SlidingWindowSpec(buckets: Int, agg: String)

/** Top-n series selection (the upstream TSDB 3.x topn query node): rank
 *  series/groups by `agg` over their output values (the upstream
 *  config's `aggregator` — sum/avg/min/max/count/last; 4-decimal
 *  rounding discipline on FP statistics) and keep the `n` largest
 *  (`top = false`: smallest). */
final case class TopNSpec(n: Int, top: Boolean = true, agg: String = "sum")

/** Moving average (the upstream TSDB 3.x moving-average query node):
 *  each bucket's value becomes the mean of the trailing `samples`
 *  buckets of its own series — weight `(1-alpha)^k` at lag k when
 *  `exponential`, equal weights (the upstream WMA/simple mode) when
 *  not. */
final case class MovingAverageSpec(samples: Int, alpha: Double = 0.5,
    exponential: Boolean = true)

/** Time-difference (the upstream TSDB 3.x TimeDifference processor):
 *  each point's value becomes the time elapsed since its series'
 *  previous point, expressed in `unit` (seconds/minutes/hours — the
 *  upstream config's ChronoUnit resolution). */
final case class TimeDifferenceSpec(unit: String = "seconds") {
  // eager: a malformed JSON document fails at parse/construction with an
  // attributable message, not later mid-plan-build
  require(Set("seconds", "minutes", "hours")(unit.toLowerCase),
    s"timeDifference unit must be seconds/minutes/hours, got $unit")
  def unitSeconds: Long = unit.toLowerCase match {
    case "seconds" => 1L
    case "minutes" => 60L
    case "hours" => 3600L
    // unreachable today (the require above pins the Set); explicit so a
    // unit added to the Set without a case FAILS here instead of
    // silently resolving to hours
    case other => throw new IllegalStateException(
      s"timeDifference unit '$other' validated but unmapped")
  }
}

/** Dense-grid fill (the downsample config's FillPolicy): materialize
 *  every interval bucket per series, absent buckets filled per policy
 *  (nan/null/zero/scalar). Requires a finite downsample interval.
 *
 *  `real` is the reference's second fill axis (FillWithRealPolicy, set
 *  alongside the constant policy on the interpolator config — aura
 *  EphemeralAuraFactory.java:227-228): fill a missing bucket from the
 *  series' nearest real value — `previous`, `next`, `prefer_previous`,
 *  `prefer_next` — or linearly interpolate between both neighbours
 *  (`lerp`). Where no real value exists on the required side(s), the
 *  constant `policy` applies. */
final case class FillSpec(policy: String = "nan", scalar: Double = 0.0,
    real: Option[String] = None) {
  require(real.forall(Set("previous", "next", "prefer_previous",
    "prefer_next", "lerp")), s"unknown real-fill policy: ${real.get}")
}

/** Per-bucket share-of-total (the upstream TSDB 3.x ratio query node):
 *  each series' value over the bucket's all-series total, ×100 when
 *  `asPercent`. */
final case class RatioSpec(asPercent: Boolean = true)

/** Histogram bucket-quantile (the upstream TSDB 3.x
 *  BucketQuantileConfig node): quantile picks from bucket-counter
 *  metric series whose bounds are parsed from the metric names
 *  (`..._0_1`, `..._1_5`, …, `..._250_inf`); counters are either
 *  per-bucket counts or Prometheus-style cumulative "le" counters
 *  (`cumulative`). Terminal over the metric axis: the node consumes
 *  the per-bucket-metric series and emits one series per (group keys,
 *  quantile). */
final case class BucketQuantileSpec(quantiles: Seq[Double],
    cumulative: Boolean = false) {
  require(quantiles.nonEmpty, "bucketQuantile needs at least one quantile")
  require(quantiles.forall(q => q > 0 && q <= 1),
    s"quantiles must be in (0,1]: $quantiles")
}

/** Terminal per-series summary (the upstream TSDB 3.x summarizer node):
 *  collapse each series' buckets to one row of summary columns
 *  (avg/sum/min/max/count/first/last). */
final case class SummarizerSpec(aggs: Seq[String])

/** Anomaly node (the upstream TSDB 3.x anomaly node family, restated
 *  deterministically): `zscore` scores each bucket against its own
 *  series' expanding earlier history; `olympic` against the trimmed
 *  mean of earlier same-seasonal-position buckets (`period` positions
 *  over the bucket index); `mad` against the WHOLE seasonal cohort's
 *  median scaled by 1.4826·MAD (robust, retrospective —
 *  [[graft.operators.SeriesAnalytics.robustZscore]]). Input values
 *  snap to 4 decimals entering the node (the engine's replayable-FP
 *  discipline). */
final case class AnomalySpec(
    model: String = "zscore", threshold: Double = Double.NaN,
    minHistory: Int = 0, period: Int = 7) {
  def resolvedThreshold: Double =
    if (threshold.isNaN) { if (model == "olympic") 0.5 else 3.0 } else threshold
  def resolvedMinHistory: Int =
    if (minHistory <= 0) { if (model == "olympic") 2 else 3 } else minHistory
}

/** Multi-source expression graph (the upstream TSDB 3.x semantic-query
 *  shape: named subqueries + an expression node combining two of them
 *  arithmetically, `ExpressionConfig.expression` = `"a / b"`). Both
 *  referenced subqueries must group by the SAME tag keys — the
 *  expression joins their aggregated outputs on those keys + bucket. */
final case class ExpressionGraph(queries: Seq[(String, TsdbQuery)], expression: String)

final case class TsdbQuery(
    filter: SeriesFilter,
    start: Long, // [start, end) in epoch seconds
    end: Long,
    downsample: Option[DownsampleSpec] = None,
    rate: Option[RateSpec] = None,
    timeDifference: Option[TimeDifferenceSpec] = None, // same slot family as rate: per-point, pre-downsample

    groupBy: Option[GroupBySpec] = None,
    shift: Option[String] = None, // evaluate shifted back in time, map ts forward (reference AuraMetricsQueryNode.java:137-148)
    explicitTags: Boolean = false,
    fill: Option[FillSpec] = None, // dense grid per series, directly above downsample
    slidingWindow: Option[SlidingWindowSpec] = None, // applied above downsample/groupBy
    movingAverage: Option[MovingAverageSpec] = None, // EWMA smoother, same slot as slidingWindow
    anomaly: Option[AnomalySpec] = None, // applied above the smoothers, below topN
    ratio: Option[RatioSpec] = None, // applied above slidingWindow output
    topN: Option[TopNSpec] = None, // applied above ratio
    summarizer: Option[SummarizerSpec] = None, // terminal: collapses the time axis
    bucketQuantile: Option[BucketQuantileSpec] = None) // terminal: collapses the metric axis
