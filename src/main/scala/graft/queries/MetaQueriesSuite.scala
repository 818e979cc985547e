package graft.queries

import graft.filters._
import graft.meta.MetaQueries
import graft.sources.TsdbViews
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Meta-query (A15) registry: q_meta_* queries over the series dimension
 * with DuckDB oracles computing the same exact cardinalities from the
 * raw events table.
 */
object MetaQueriesSuite {

  type Q = (SparkSession, String) => DataFrame

  private def dim(s: SparkSession, d: String): DataFrame =
    TsdbViews.seriesDim(TsdbViews.points(s, d))

  val defs: Map[String, Q] = Map(
    // METRICS restricted by a tag filter
    "q_meta_metrics" -> ((s, d) =>
      MetaQueries.metrics(dim(s, d), TagLiteral("colo", Seq("sjc")))),

    // TAG_KEYS over all series (env key has a smaller cardinality)
    "q_meta_tag_keys" -> ((s, d) => MetaQueries.tagKeys(dim(s, d), MatchAll)),

    // TAG_VALUES of `host`
    "q_meta_tag_values" -> ((s, d) =>
      MetaQueries.tagValues(dim(s, d), MatchAll, "host")),

    // TAG_VALUES of `user` with a discriminating sizeLimit (150 values,
    // capped at 100 after lexicographic sort — exercises T2+T4)
    "q_meta_tag_values_limited" -> ((s, d) =>
      MetaQueries.tagValues(dim(s, d), MatchAll, "user", limit = 100)),

    // TAG_VALUES as plain SQL over the facade's series-dim view (round
    // 12, the q_sql_* discipline): the meta autocomplete a SQL user
    // writes directly — q_meta_tag_values' oracle verbatim
    "q_sql_meta_tag_values" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        s"""SELECT tags['host'] AS tag_value,
           |       count(DISTINCT series_id) AS cardinality
           |FROM graft_series_dim
           |WHERE map_contains_key(tags, 'host')
           |GROUP BY 1 ORDER BY tag_value LIMIT ${MetaQueries.SizeLimit}""".stripMargin)
    },

    // TAG_KEYS_AND_VALUES under a metric filter
    "q_meta_keys_values" -> ((s, d) =>
      MetaQueries.tagKeysAndValues(dim(s, d), MetricLiteral(Seq("click", "error")))),

    // BASIC summary cardinalities
    "q_meta_basic" -> ((s, d) => MetaQueries.basic(dim(s, d), MatchAll)),

    // TIMESERIES: the matching series themselves
    "q_meta_timeseries" -> ((s, d) =>
      MetaQueries.timeseries(dim(s, d), TagRegexp("host", "web0[01]"))),

    // NAMESPACES: distinct event namespaces with document counts (the
    // reference's NAMESPACES meta type lives in the events domain)
    "q_meta_namespaces" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      graft.events.EventsModel.docs(s, d)
        .groupBy(col("namespace"))
        .agg(count(lit(1)).as("cardinality"))
        .orderBy(col("namespace"))
        .limit(MetaQueries.SizeLimit)
    },

    // KMV bottom-k distinct-series cardinality sketch (the
    // deterministic, oracle-checkable approximate counterpart to
    // METRICS/BASIC' exact countDistinct): k=8 so BOTH gate scales (15
    // and 150 series per metric) exercise the ESTIMATOR branch, never
    // the exact-count fallback. The oracle replays the identical
    // md5-prefix hash ranks and the one (k-1)*2^28/h_k division.
    "q_meta_cardinality_sketch" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      val ident = concat_ws("|", col("metric"), col("tags")("user"),
        col("tags")("host"), col("tags")("colo"),
        coalesce(col("tags")("env"), lit("")))
      MetaQueries.cardinalitySketch(dim(s, d), MatchAll, ident, k = 8)
    },

    // COUNT-MIN heavy-hitter estimation (round 11 — the frequency
    // companion to the KMV cardinality sketch): point-occurrence
    // frequency per user from a 4×512 cell grid, reported for the
    // top-16 exact keys with the exact count beside the estimate (the
    // minhashEval estimator-quality discipline). 750 keys into 512
    // cells ⇒ real collisions: some rows overcount, none undercount —
    // both engines replay the identical md5 cell walk, so the hash
    // pins the estimator, not just the exact side.
    "q_meta_cms_users" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      graft.operators.CountMin.report(
        TsdbViews.points(s, d), col("tags")("user"), depth = 4, width = 512, k = 16)
        .select(col("key").as("tag_user"), col("exact_n"), col("est_n"))
    },

    // the CM dimension planner: d×w from (ε, δ) analytically — constant
    // work, no data scan (the bandingPlan discipline)
    "q_meta_cms_plan" -> ((s, _) => graft.operators.CountMin.plan(s)),

    // the DDSketch dimension planner: bucket budget from the relative-
    // error target α analytically — γ and the twelve-decade bucket
    // count (the same closed-form, no-scan discipline)
    "q_meta_dds_plan" -> ((s, _) => graft.operators.QuantileSketch.plan(s)),

    // KMV SET ALGEBRA (round 11): union/intersection cardinality and
    // Jaccard for two tag predicates (colo=den, env=prod — a real overlap:
    // every tenth user carries both) from ONE bottom-32 union sketch,
    // with the exact counts joined beside the estimates (the cms-report
    // estimator-quality discipline). k=32 < series-per-metric at both
    // gate scales, so the ESTIMATOR branch (not the exact fallback)
    // carries the hash.
    "q_meta_kmv_setops" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      val fA = TagLiteral("colo", Seq("den"))
      val fB = TagLiteral("env", Seq("prod"))
      val ident = concat_ws("|", col("metric"), col("tags")("user"),
        col("tags")("host"), col("tags")("colo"),
        coalesce(col("tags")("env"), lit("")))
      val dimDf = dim(s, d)
      def p(f: SeriesFilter) =
        coalesce(SeriesFilter.compile(f, col("metric"), col("tags")), lit(false))
      val exact = dimDf
        .select(col("metric"), p(fA).as("__a"), p(fB).as("__b"))
        .filter(col("__a") || col("__b"))
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("exact_inter"))
      MetaQueries.sketchSetOps(dimDf, fA, fB, ident, k = 32)
        .join(exact, "metric")
        .orderBy(col("metric"))
    },

    // META via the query-JSON front end (the reference's
    // MetaQueryBuilderTSDBExt.fromTSDBQueryFilter path,
    // MetaQueryBuilderTSDBExt.java:58-66): the SAME selection as
    // q_meta_metrics, with the filter arriving as a client JSON document;
    // shares q_meta_metrics' oracle verbatim
    "q_json_meta_metrics" -> { (s, d) =>
      val parsed = graft.query.TsdbJson.parseFilter(
        """{"type": "TagValueLiteralOr", "tagKey": "colo", "filter": "sjc"}""")
      MetaQueries.metrics(dim(s, d), parsed.filter)
    },

    // full meta-query documents through the type-enum dispatch
    // (MetaQueryBuilder.java:31-39 via TsdbJson.parseMetaQuery →
    // MetaQueries.run); each shares its direct twin's oracle verbatim
    "q_json_meta_tag_keys" -> { (s, d) =>
      MetaQueries.run(dim(s, d),
        graft.query.TsdbJson.parseMetaQuery("""{"type": "TAG_KEYS"}"""))
    },

    "q_json_meta_tag_values" -> { (s, d) =>
      MetaQueries.run(dim(s, d),
        graft.query.TsdbJson.parseMetaQuery(
          """{"type": "TAG_VALUES", "aggregationField": "host"}"""))
    }
  )

  // ------------------------------------------------------------- oracles

  /** The distinct-series set (metric × derived tags) as a DuckDB CTE —
   *  the independent restatement of seriesDim. */
  private val seriesCte: String =
    """series AS (
      |  SELECT DISTINCT event_type AS metric,
      |         CAST(user_id AS VARCHAR) AS tag_user,
      |         'web' || lpad(CAST(user_id % 3 AS VARCHAR), 2, '0') AS tag_host,
      |         CASE WHEN user_id % 2 = 0 THEN 'den' ELSE 'sjc' END AS tag_colo,
      |         CASE WHEN user_id % 5 = 0 THEN 'prod' ELSE NULL END AS tag_env
      |  FROM events)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_meta_metrics" ->
      s"""WITH $seriesCte
         |SELECT metric, count(*) AS cardinality
         |FROM series WHERE tag_colo = 'sjc'
         |GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_tag_keys" ->
      s"""WITH $seriesCte,
         |k AS (
         |  SELECT 'user' AS tag_key, count(*) AS cardinality FROM series
         |  UNION ALL SELECT 'host', count(*) FROM series
         |  UNION ALL SELECT 'colo', count(*) FROM series
         |  UNION ALL SELECT 'env', count(*) FROM series WHERE tag_env IS NOT NULL)
         |SELECT * FROM k ORDER BY tag_key LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_tag_values" ->
      s"""WITH $seriesCte
         |SELECT tag_host AS tag_value, count(*) AS cardinality
         |FROM series GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    // SQL-facade replay: the identical restatement
    "q_sql_meta_tag_values" ->
      s"""WITH $seriesCte
         |SELECT tag_host AS tag_value, count(*) AS cardinality
         |FROM series GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_tag_values_limited" ->
      s"""WITH $seriesCte
         |SELECT tag_user AS tag_value, count(*) AS cardinality
         |FROM series GROUP BY 1 ORDER BY 1 LIMIT 100""".stripMargin,

    "q_meta_keys_values" ->
      s"""WITH $seriesCte,
         |f AS (SELECT * FROM series WHERE metric IN ('click', 'error')),
         |kv AS (
         |  SELECT 'user' AS tag_key, tag_user AS tag_value, count(*) AS cardinality FROM f GROUP BY 2
         |  UNION ALL SELECT 'host', tag_host, count(*) FROM f GROUP BY 2
         |  UNION ALL SELECT 'colo', tag_colo, count(*) FROM f GROUP BY 2
         |  UNION ALL SELECT 'env', tag_env, count(*) FROM f WHERE tag_env IS NOT NULL GROUP BY 2)
         |SELECT * FROM kv ORDER BY tag_key, tag_value LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_basic" ->
      s"""WITH $seriesCte
         |SELECT count(*) AS n_series,
         |       count(DISTINCT metric) AS n_metrics,
         |       3 + CASE WHEN count(*) FILTER (tag_env IS NOT NULL) > 0 THEN 1 ELSE 0 END AS n_tag_keys,
         |       count(DISTINCT tag_user) + count(DISTINCT tag_host)
         |         + count(DISTINCT tag_colo) + count(DISTINCT tag_env) AS n_tag_pairs
         |FROM series""".stripMargin,

    "q_meta_timeseries" ->
      s"""WITH $seriesCte
         |SELECT metric, tag_user, tag_host, tag_colo, tag_env
         |FROM series WHERE regexp_matches(tag_host, 'web0[01]')
         |ORDER BY metric, tag_user LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_namespaces" ->
      s"""SELECT event_type AS namespace, count(*) AS cardinality
         |FROM events GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_meta_cardinality_sketch" ->
      s"""WITH $seriesCte,
         |hashed AS (
         |  SELECT metric,
         |         ('0x' || substr(md5(metric || '|' || tag_user || '|' || tag_host
         |             || '|' || tag_colo || '|' || coalesce(tag_env, '')), 1, 7))::BIGINT AS h
         |  FROM series),
         |ranked AS (
         |  SELECT metric, h, row_number() OVER (PARTITION BY metric ORDER BY h) AS rn
         |  FROM hashed)
         |SELECT metric, count(*) AS sketch_n,
         |       CASE WHEN count(*) < 8 THEN CAST(count(*) AS DOUBLE)
         |            ELSE round(7 * 268435456.0 / max(h), 4) END AS est_series
         |FROM ranked WHERE rn <= 8
         |GROUP BY metric ORDER BY metric LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    // the count-min grid restated cell by cell: same md5 row hashes,
    // same width, min over the key's 4 cells (0 where untouched)
    "q_meta_cms_users" ->
      s"""WITH ${OracleCommon.pointsCtes},
         |counts AS (SELECT tag_user, count(*) AS exact_n FROM points GROUP BY 1),
         |top AS (SELECT * FROM counts ORDER BY exact_n DESC, tag_user LIMIT 16),
         |drows AS (SELECT unnest([0, 1, 2, 3]) AS i),
         |cells AS (
         |  SELECT i,
         |         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tag_user), 1, 7))::BIGINT
         |           % 512 AS j,
         |         count(*) AS cnt
         |  FROM points CROSS JOIN drows GROUP BY 1, 2),
         |est AS (
         |  SELECT t.tag_user, min(coalesce(c.cnt, 0)) AS est_n
         |  FROM top t CROSS JOIN drows d
         |  LEFT JOIN cells c ON c.i = d.i
         |    AND c.j = ('0x' || substr(md5(CAST(d.i AS VARCHAR) || '|' || t.tag_user), 1, 7))::BIGINT % 512
         |  GROUP BY 1)
         |SELECT t.tag_user, t.exact_n, e.est_n
         |FROM top t JOIN est e ON e.tag_user = t.tag_user""".stripMargin,

    // w = ceil(e/eps), d = ceil(ln(1/delta)) at eps=0.001, delta=0.01
    "q_meta_cms_plan" ->
      s"""SELECT CAST(power(10.0, i) AS BIGINT) AS n_items,
         |       CAST(ceil(ln(1.0/0.01)) AS BIGINT) AS depth,
         |       CAST(ceil(exp(1.0)/0.001) AS BIGINT) AS width,
         |       CAST(ceil(ln(1.0/0.01)) AS BIGINT)
         |         * CAST(ceil(exp(1.0)/0.001) AS BIGINT) AS cells,
         |       round(0.001 * power(10.0, i), 4) AS max_overcount,
         |       round(0.99, 4) AS confidence
         |FROM range(6, 12) AS t(i)""".stripMargin,

    // gamma = (1+a)/(1-a); buckets spanning 1e-3..1e9 = ceil(ln 1e12 /
    // ln gamma) + 2 (zero bucket + boundary ceil); 16 B per bucket
    "q_meta_dds_plan" ->
      s"""SELECT alpha,
         |       ${OracleCommon.rnd("(1.0 + alpha) / (1.0 - alpha)", 6)} AS gamma,
         |       CAST(ceil(ln(1e12) / ln((1.0 + alpha) / (1.0 - alpha))) AS BIGINT) + 2
         |         AS buckets_12dec,
         |       (CAST(ceil(ln(1e12) / ln((1.0 + alpha) / (1.0 - alpha))) AS BIGINT) + 2) * 16
         |         AS sketch_bytes
         |FROM (SELECT unnest([0.005, 0.01, 0.02, 0.05, 0.1]::DOUBLE[]) AS alpha)
         |ORDER BY alpha""".stripMargin,

    // the KMV set-ops walk restated: same identity hash, same
    // (hash, identity) total order, same bottom-32 union sketch, same
    // rho-scaled intersection estimator, exact counts beside
    "q_meta_kmv_setops" ->
      s"""WITH $seriesCte,
         |flagged AS (
         |  SELECT metric,
         |         metric || '|' || tag_user || '|' || tag_host || '|' || tag_colo
         |           || '|' || coalesce(tag_env, '') AS ident,
         |         coalesce(tag_colo = 'den', FALSE) AS a,
         |         coalesce(tag_env = 'prod', FALSE) AS b
         |  FROM series
         |  WHERE tag_colo = 'den' OR tag_env = 'prod'),
         |hashed AS (
         |  SELECT metric, a, b, ident,
         |         ('0x' || substr(md5(ident), 1, 7))::BIGINT AS h
         |  FROM flagged),
         |ranked AS (
         |  SELECT metric, a, b, h,
         |         row_number() OVER (PARTITION BY metric ORDER BY h, ident) AS rn
         |  FROM hashed),
         |agg AS (
         |  SELECT metric, count(*) AS sketch_n, max(h) AS hk,
         |         sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS ki
         |  FROM ranked WHERE rn <= 32 GROUP BY 1),
         |est AS (
         |  SELECT metric, sketch_n, ki,
         |         CASE WHEN sketch_n < 32 THEN CAST(sketch_n AS DOUBLE)
         |              ELSE ${OracleCommon.rnd("31 * 268435456.0 / hk")} END AS union_est
         |  FROM agg),
         |exact AS (
         |  SELECT metric, count(*) AS exact_union,
         |         CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
         |  FROM flagged GROUP BY 1)
         |SELECT e.metric, e.sketch_n, e.union_est,
         |       ${OracleCommon.rnd("e.ki * e.union_est / e.sketch_n")} AS inter_est,
         |       ${OracleCommon.rnd("CAST(e.ki AS DOUBLE) / e.sketch_n")} AS jaccard_est,
         |       x.exact_union, x.exact_inter
         |FROM est e JOIN exact x USING (metric)
         |ORDER BY e.metric LIMIT ${MetaQueries.SizeLimit}""".stripMargin
  ) ++ Map(
    // JSON front-end replay: same selection, same oracle — a parser
    // divergence shows up as a hash mismatch
    "q_json_meta_metrics" ->
      s"""WITH $seriesCte
         |SELECT metric, count(*) AS cardinality
         |FROM series WHERE tag_colo = 'sjc'
         |GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_json_meta_tag_keys" ->
      s"""WITH $seriesCte,
         |k AS (
         |  SELECT 'user' AS tag_key, count(*) AS cardinality FROM series
         |  UNION ALL SELECT 'host', count(*) FROM series
         |  UNION ALL SELECT 'colo', count(*) FROM series
         |  UNION ALL SELECT 'env', count(*) FROM series WHERE tag_env IS NOT NULL)
         |SELECT * FROM k ORDER BY tag_key LIMIT ${MetaQueries.SizeLimit}""".stripMargin,

    "q_json_meta_tag_values" ->
      s"""WITH $seriesCte
         |SELECT tag_host AS tag_value, count(*) AS cardinality
         |FROM series GROUP BY 1 ORDER BY 1 LIMIT ${MetaQueries.SizeLimit}""".stripMargin
  )
}
