package graft.meta

import graft.filters.SeriesFilter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Metadata queries (reference A15): the NAMESPACES/METRICS/TAG_KEYS/
 * TAG_VALUES/TAG_KEYS_AND_VALUES/BASIC/TIMESERIES query family the
 * reference runs against its inverted index
 * (core/.../meta/MetaQueryBuilder.java:31-39 type enum; execution
 * NewDocStore.java:883-1090; result shaping MetaSearchResults.java:147-290),
 * re-expressed over the `series_dim` dimension table with exact
 * `countDistinct` cardinalities.
 *
 * Results are capped at the reference's sizeLimit of 1024
 * (core/.../meta/MetaQuery.java:30) after a deterministic sort (T2/T4).
 *
 * Scale: series_dim is O(|series|), orders of magnitude smaller than the
 * fact table — every meta query here touches only the dimension, exactly
 * like the reference never touches data segments for meta. The explodes
 * are per-series (bounded by tag count ≤ 255), and the aggregates are
 * partial+final hash aggregates.
 */
/** A parsed meta query (reference MetaQuery.java: type enum +
 *  QueryFilter + TAG_VALUES aggregation field + size cap), produced by
 *  [[graft.query.TsdbJson.parseMetaQuery]] and executed by
 *  [[MetaQueries.run]]. */
final case class MetaRequest(
    metaType: String,
    filter: SeriesFilter,
    aggregationField: Option[String] = None,
    size: Int = MetaQueries.SizeLimit)

object MetaQueries {

  /** Reference result cap (MetaQuery.java:30). */
  val SizeLimit = 1024

  /** Execute a [[MetaRequest]] against the series dimension — the
   *  type-enum dispatch of the reference's meta endpoint
   *  (MetaQueryBuilder.java:31-39). NAMESPACES lives in the events
   *  domain (a different store), so it is not served from `dim`. */
  def run(dim: DataFrame, r: MetaRequest): DataFrame = r.metaType match {
    case "METRICS" => metrics(dim, r.filter, r.size)
    case "TAG_KEYS" => tagKeys(dim, r.filter, r.size)
    case "TAG_VALUES" =>
      val key = r.aggregationField.getOrElse(
        throw new IllegalArgumentException("TAG_VALUES needs 'aggregationField'"))
      tagValues(dim, r.filter, key, r.size)
    case "TAG_KEYS_AND_VALUES" => tagKeysAndValues(dim, r.filter, r.size)
    case "BASIC" => basic(dim, r.filter)
    case "TIMESERIES" => timeseries(dim, r.filter, r.size)
    case other =>
      throw new IllegalArgumentException(s"unsupported meta query type '$other'")
  }

  private def pred(f: SeriesFilter): Column =
    SeriesFilter.compile(f, col("metric"), col("tags"))

  /** METRICS: distinct metric names with series cardinalities. */
  def metrics(dim: DataFrame, f: SeriesFilter, limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f))
      .groupBy(col("metric"))
      .agg(countDistinct(col("series_id")).as("cardinality"))
      .orderBy(col("metric"))
      .limit(limit)

  /** TAG_KEYS: distinct tag keys with series cardinalities. */
  def tagKeys(dim: DataFrame, f: SeriesFilter, limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f))
      .select(col("series_id"), explode(map_keys(col("tags"))).as("tag_key"))
      .groupBy(col("tag_key"))
      .agg(countDistinct(col("series_id")).as("cardinality"))
      .orderBy(col("tag_key"))
      .limit(limit)

  /** TAG_VALUES: distinct values of one tag key with cardinalities. */
  def tagValues(dim: DataFrame, f: SeriesFilter, key: String, limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f) && map_contains_key(col("tags"), lit(key)))
      .select(col("series_id"), col("tags")(key).as("tag_value"))
      .groupBy(col("tag_value"))
      .agg(countDistinct(col("series_id")).as("cardinality"))
      .orderBy(col("tag_value"))
      .limit(limit)

  /** TAG_KEYS_AND_VALUES: distinct (key, value) pairs with cardinalities. */
  def tagKeysAndValues(dim: DataFrame, f: SeriesFilter, limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f))
      .select(col("series_id"), explode(col("tags")).as(Seq("tag_key", "tag_value")))
      .groupBy(col("tag_key"), col("tag_value"))
      .agg(countDistinct(col("series_id")).as("cardinality"))
      .orderBy(col("tag_key"), col("tag_value"))
      .limit(limit)

  /** BASIC: one-row summary cardinalities of the filtered series set. */
  def basic(dim: DataFrame, f: SeriesFilter): DataFrame = {
    val filtered = dim.filter(pred(f))
    val exploded = filtered
      .select(col("series_id"), col("metric"), explode(col("tags")).as(Seq("k", "v")))
    exploded.agg(
      countDistinct(col("series_id")).as("n_series"),
      countDistinct(col("metric")).as("n_metrics"),
      countDistinct(col("k")).as("n_tag_keys"),
      countDistinct(col("k"), col("v")).as("n_tag_pairs"))
  }

  /** Approximate-cardinality variant of METRICS (HLL sketch): the scale
   *  path when exact distinct counts over billions of series are not
   *  worth a full shuffle — the reference's bitmaps are exact, so this is
   *  an extension, checked against the exact path in unit tests. */
  def metricsApprox(dim: DataFrame, f: SeriesFilter, rsd: Double = 0.02,
      limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f))
      .groupBy(col("metric"))
      .agg(approx_count_distinct(col("series_id"), rsd).as("cardinality"))
      .orderBy(col("metric"))
      .limit(limit)

  /** KMV ("k-minimum-values" / bottom-k) distinct-series cardinality
   *  sketch per metric — the DETERMINISTIC approximate counterpart to
   *  [[metricsApprox]]: where HLL's estimate is engine-specific (only
   *  unit-checkable against the exact path), KMV ranks integer
   *  md5-prefix hashes and applies one double division, so the estimate
   *  replays bit-identically in any engine — it carries a full DuckDB
   *  oracle. `identity` is the caller's canonical series-identity string
   *  (hashed with the engine's 28-bit base hash,
   *  [[graft.functions.Md5Prefix28]]).
   *
   *  est = (k−1) · 2²⁸ / h_k with h_k the k-th smallest hash (Beyer et
   *  al. 2007, "On synopses for distinct-value estimation under
   *  multiset operations"); groups with fewer than k hashes report the
   *  exact count. Hash-collision duplicates are deliberately KEPT (no
   *  distinct): the dim has one row per series, 28-bit collisions are
   *  the only duplicate source, and skipping the dedupe drops a whole
   *  dim-sized exchange while both engines see the identical multiset.
   *
   *  Plan shape — why this is the 100 TB cardinality answer where the
   *  exact walk (reference NewDocStore.java:883-1090 over its inverted
   *  index) becomes a full shuffle: the `row_number ≤ k` filter
   *  triggers Spark's WindowGroupLimit, so every map partition forwards
   *  at most k hashes per metric BEFORE the exchange — bottom-k's
   *  mergeability made physical; the shuffle is ≤ partitions × k rows
   *  per metric whatever |series| is. */
  def cardinalitySketch(dim: DataFrame, f: SeriesFilter, identity: Column,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV sketch needs k >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("metric")).orderBy(col("__h").asc)
    dim.filter(pred(f))
      .select(col("metric"), call_function("md5prefix28", identity).as("__h"))
      // a NULL identity has no defined hash rank (Spark sorts NULLS
      // FIRST ascending, DuckDB NULLS LAST — engine-divergent); callers
      // must coalesce nullable components (concat_ws does), and any
      // null that slips through is excluded from the sketched set
      .filter(col("__h").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("sketch_n"), max(col("__h")).as("__hk"))
      .withColumn("est_series",
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 268435456.0) / col("__hk"), 4)))
      .select(col("metric"), col("sketch_n"), col("est_series"))
      .orderBy(col("metric"))
      .limit(SizeLimit)
  }

  /** KMV SET ALGEBRA (Beyer et al. 2007, "On synopses for distinct
   *  value estimation under multiset operations"): union cardinality,
   *  intersection cardinality, and Jaccard for TWO filter predicates
   *  from one bottom-k sketch over their union — the sketch-family
   *  answer to "how many series match A AND B / A OR B" without a
   *  distinct-count over either set.
   *
   *  Estimators: with the union's bottom-k hashes S (|S| = n ≤ k,
   *  threshold h_k = max S), U ≈ (k−1)·2^28/h_k (the [[
   *  cardinalitySketch]] estimator) and, because S is a uniform sample
   *  of A∪B, the intersection fraction ρ = |{h∈S : h∈A ∧ h∈B}|/n
   *  estimates Jaccard directly; |A∩B| ≈ ρ·U. Below saturation
   *  (n < k) the sketch IS the union and both estimates are exact.
   *
   *  Determinism: rows order by (hash, identity) — the identity
   *  tiebreak makes the selected bottom-k set total-ordered, so both
   *  engines pick the same k rows even on a 28-bit hash collision.
   *  Plan shape: the row_number ≤ k filter triggers WindowGroupLimit
   *  (≤ k rows per metric forwarded per map partition), the same
   *  bounded-exchange contract as cardinalitySketch.
   *
   *  PRECONDITION: the identity expression must be non-null for every
   *  row it should sketch — coalesce every nullable tag component (as
   *  the gate queries do for `env`; `concat_ws` alone also never
   *  yields NULL but silently SKIPS null parts, which can alias two
   *  distinct identities). A NULL identity has no engine-agreed hash
   *  rank (Spark orders NULLS FIRST ascending, DuckDB NULLS LAST), so
   *  null identities are excluded from the sketched set here rather
   *  than left to diverge. */
  def sketchSetOps(dim: DataFrame, fA: SeriesFilter, fB: SeriesFilter,
      identity: Column, k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV sketch needs k >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("metric")).orderBy(col("__h").asc, col("__id").asc)
    dim.filter(pred(fA) || pred(fB))
      .select(col("metric"), identity.as("__id"),
        call_function("md5prefix28", identity).as("__h"),
        coalesce(pred(fA), lit(false)).as("__a"),
        coalesce(pred(fB), lit(false)).as("__b"))
      .filter(col("__id").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("sketch_n"), max(col("__h")).as("__hk"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("__ki"))
      .withColumn("union_est",
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 268435456.0) / col("__hk"), 4)))
      .withColumn("inter_est",
        round(col("__ki") * col("union_est") / col("sketch_n"), 4))
      .withColumn("jaccard_est",
        round(col("__ki").cast("double") / col("sketch_n"), 4))
      .select(col("metric"), col("sketch_n"), col("union_est"),
        col("inter_est"), col("jaccard_est"))
      .orderBy(col("metric"))
      .limit(SizeLimit)
  }

  /** TIMESERIES: the matching series themselves (metric + tags),
   *  deterministically ordered and capped. */
  def timeseries(dim: DataFrame, f: SeriesFilter, limit: Int = SizeLimit): DataFrame =
    dim.filter(pred(f))
      .select(col("metric"), col("tags")("user").as("tag_user"),
        col("tags")("host").as("tag_host"), col("tags")("colo").as("tag_colo"),
        col("tags")("env").as("tag_env"))
      .orderBy(col("metric"), col("tag_user"))
      .limit(limit)
}
