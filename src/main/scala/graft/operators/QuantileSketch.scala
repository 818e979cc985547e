package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DDSketch-style mergeable quantile sketch (Masson, Rim & Lee 2019,
 * "DDSketch: a fast and fully-mergeable quantile sketch with
 * relative-error guarantees", VLDB 12(12)): values land in
 * exponentially-spaced buckets idx = ⌈log_γ(v)⌉ with γ = (1+α)/(1−α);
 * the quantile estimate is the γ-midpoint 2γ^idx/(γ+1) of the bucket
 * holding rank ⌊q·(n−1)⌋ — guaranteed within RELATIVE error α of the
 * true quantile, at every q, whatever the value distribution.
 *
 * Where this fits the engine: the percentile family so far is exact
 * (sort-based `percentile` plugin, rollup-stored lossless 1/4 sample).
 * Exactness costs a per-group sort of the raw values; at 100 TB a p99
 * dashboard cannot re-sort history per query. The DDSketch bucket
 * relation is the bounded summary: per key it holds at most
 * 2·⌈log_γ(v_max/v_min)⌉ + 3 rows REGARDLESS of fact size (α = 1% ⇒
 * γ ≈ 1.0202 ⇒ ~1,388 buckets spanning TWELVE decades of value), and
 * because bucket counts are SUMS the sketch merges by (sgn, idx)
 * cell-wise addition — the same counts-add contract as the count-min
 * cells and the drift token counts, so the streaming ingest can keep
 * per-micro-batch partials whose read-side merge equals the one-shot
 * batch sketch EXACTLY (bit-identical estimates, not merely close).
 * This completes the sketch family: KMV (cardinality), count-min
 * (frequency), DDSketch (quantiles).
 *
 * Sign handling (full DDSketch generality): three stores — negatives
 * bucket over |v| with sgn = −1, an exact zero bucket (sgn = 0), and
 * the positive store (sgn = +1). Walk order for the quantile scan is
 * `sgn ASC, sgn·idx ASC`: within the negative store larger idx means
 * more negative, so sgn·idx = −idx ascending walks most-negative
 * first; the positive store walks idx ascending; zero sits between.
 * (sgn, idx) is unique after aggregation, so the order is total.
 *
 * Determinism across engines: the bucket index is raw
 * ⌈ln|v|/ln γ⌉ in both Spark and the DuckDB oracle. Both engines
 * evaluate IEEE-754 doubles; a libm last-ulp divergence in `ln` could
 * flip the ceil only for a value within ~1 ulp of an exact bucket
 * boundary γ^k — a measure-zero band that real (noisy) measurements
 * never occupy, and the one systematic boundary value v = 1.0 is exact
 * in both engines (ln 1 = 0). Estimates are rounded to 4 decimals at
 * the output edge, the engine-wide hash convention.
 *
 * Plan shape at 100 TB: the build is one fact-sized scan whose partial
 * aggregation collapses to ≤ keys × buckets-per-key rows per map
 * partition BEFORE the exchange — the shuffle is bounded by the
 * summary size, never the fact size. The quantile walk windows over
 * the bucket relation partitioned BY KEY (thousands of rows at most),
 * and the totals join broadcasts the per-key counts; no fact-sized
 * side ever reaches the walk.
 *
 * Reference analog: the reference serves percentiles by re-scanning
 * raw Gorilla segments (aura-metrics DownSampler percentile path); the
 * sketch is the summary-serving upgrade its OpenTSDB 3.x lineage ships
 * as histogram buckets (the `le` bucket-quantile family this engine
 * already implements) — DDSketch replaces fixed `le` edges with
 * relative-error geometric edges.
 */
object QuantileSketch {

  /** γ from the relative-error target α (both quantile under- and
   *  over-estimates stay within α·|true|). */
  def gamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    (1.0 + alpha) / (1.0 - alpha)
  }

  /** Build the bucket relation: one (key, sgn, idx, cnt) row per
   *  non-empty bucket per key. Null, NaN, AND infinite values are
   *  skipped (NaN per the engine's NaN-as-missing contract; ±∞ has no
   *  finite log-space bucket — Spark would saturate the ceil while the
   *  oracle's BIGINT cast errors, so the class is excluded from the
   *  event space outright); v = 0 lands in the exact zero bucket
   *  rather than at −∞ in log space. */
  def sketch(df: DataFrame, key: Column, value: Column, alpha: Double): DataFrame = {
    val g = gamma(alpha)
    df.select(key.cast("string").as("key"), value.cast("double").as("__v"))
      .filter(col("key").isNotNull && col("__v").isNotNull && !isnan(col("__v")) &&
        col("__v") =!= Double.PositiveInfinity && col("__v") =!= Double.NegativeInfinity)
      .select(col("key"),
        when(col("__v") > 0, lit(1)).when(col("__v") < 0, lit(-1)).otherwise(lit(0)).as("sgn"),
        when(col("__v") === 0, lit(0L))
          .otherwise(ceil(log(abs(col("__v"))) / log(lit(g)))).as("idx"))
      .groupBy(col("key"), col("sgn"), col("idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge appended partial sketches (per-micro-batch bucket rows):
   *  cell-wise sum — the DDSketch merge operation. */
  def merge(buckets: DataFrame): DataFrame =
    buckets.groupBy(col("key"), col("sgn"), col("idx")).agg(sum(col("cnt")).as("cnt"))

  /** Per-key bucket γ-midpoint: the value every member of the bucket
   *  is within α of. Shared by the walk and the oracle restatement. */
  private def midpoint(g: Double): Column =
    when(col("sgn") === 0, lit(0.0))
      .otherwise(col("sgn") * lit(2.0) * pow(lit(g), col("idx")) / lit(g + 1.0))

  /** Estimate the given quantiles per key from a bucket relation:
   *  (key, q, est_v). Rank convention: r = ⌊q·(n−1)⌋ zero-based; the
   *  estimate is the midpoint of the first bucket (in walk order)
   *  whose cumulative count exceeds r.
   *
   *  The per-key total comes from a SECOND window over the SAME key
   *  partitioning (whole-partition frame), not a groupBy joined back —
   *  a join would reference the bucket lineage twice and re-evaluate
   *  the fact-sized build upstream (the robustZscore lesson; the first
   *  cut of this walk carried two parquet scans in its plan). One
   *  exchange, one sort, everything after the build summary-sized. */
  def quantiles(buckets: DataFrame, qs: Seq[Double], alpha: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q < 1), s"quantiles in [0,1): $qs")
    val g = gamma(alpha)
    val spark = buckets.sparkSession
    import spark.implicits._
    val walk = Window.partitionBy(col("key"))
      .orderBy(col("sgn").asc, (col("sgn") * col("idx")).asc)
    val whole = Window.partitionBy(col("key"))
    buckets
      .withColumn("cum", sum(col("cnt")).over(walk))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("est", midpoint(g))
      .crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") > floor(col("q") * (col("n") - 1)))
      .groupBy(col("key"), col("q"))
      .agg(round(min_by(col("est"), col("cum")), 4).as("est_v"))
  }

  /** Estimator-quality report (the minhashEval / count-min `report`
   *  discipline): per key, the EXACT quantile beside the sketch
   *  estimate. The exact side is the evaluation harness — a
   *  deployment keeps only the buckets. Both sides share ONE event
   *  space: the exact column excludes null/NaN AND ±∞ exactly like
   *  [[sketch]] (an infinity kept on only one side would make the
   *  exact quantile and the estimate describe different populations). */
  def report(df: DataFrame, key: Column, value: Column, q: Double,
      alpha: Double): DataFrame = {
    val exact = df
      .select(key.cast("string").as("key"), value.cast("double").as("__v"))
      .filter(col("key").isNotNull && col("__v").isNotNull && !isnan(col("__v")) &&
        col("__v") =!= Double.PositiveInfinity && col("__v") =!= Double.NegativeInfinity)
      .groupBy(col("key"))
      .agg(round(percentile(col("__v"), lit(q)), 4).as("exact_v"))
    quantiles(sketch(df, key, value, alpha), Seq(q), alpha)
      .join(exact, "key")
      .select(col("key"), col("q"), col("exact_v"), col("est_v"))
  }

  /** Dimension planner (the bandingPlan / CountMin.plan discipline):
   *  bucket budget from the accuracy target analytically. For each
   *  candidate α: γ, the worst-case bucket count to span twelve
   *  decades of positive value (1e−3 .. 1e9 — ⌈ln 1e12 / ln γ⌉ + 2 for
   *  the zero bucket and the boundary ceil), and the sketch bytes at
   *  16 B/bucket. Closed-form, no data scan. */
  def plan(spark: org.apache.spark.sql.SparkSession,
      alphas: Seq[Double] = Seq(0.005, 0.01, 0.02, 0.05, 0.1)): DataFrame = {
    import spark.implicits._
    alphas.toDF("alpha")
      .select(col("alpha"),
        round((lit(1.0) + col("alpha")) / (lit(1.0) - col("alpha")), 6).as("gamma"),
        (ceil(log(lit(1e12)) / log((lit(1.0) + col("alpha")) / (lit(1.0) - col("alpha"))))
          + lit(2L)).as("buckets_12dec"))
      .withColumn("sketch_bytes", col("buckets_12dec") * 16)
      .orderBy(col("alpha"))
  }
}
