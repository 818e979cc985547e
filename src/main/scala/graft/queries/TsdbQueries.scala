package graft.queries

import graft.filters._
import graft.operators.Latest
import graft.query._
import graft.sources.TsdbViews
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TSDB operator queries (SURVEY §2.2 filters, §2.4 downsample, §2.5
 * rate/shift, A11 group-by, A18 last-value, S5 dedupe) wired onto the
 * driver's `events` table, each paired with an independent DuckDB oracle.
 */
object TsdbQueries {
  import OracleCommon._

  type Q = (SparkSession, String) => DataFrame

  private def pts(s: SparkSession, dir: String): DataFrame = TsdbViews.points(s, dir)

  private def run(s: SparkSession, dir: String, q: TsdbQuery): DataFrame =
    QueryEngine.run(pts(s, dir), q)

  /** Range-filtered + deduped points (the scan+dedupe prefix shared by the
   *  composed multi-stage queries). */
  private def prepared(s: SparkSession, dir: String): DataFrame =
    QueryEngine.dedupe(
      pts(s, dir).filter(col("ts") >= lit(Start) && col("ts") < lit(End)))

  /** DDSketch accuracy target shared by the batch quantile query, its
   *  streamed restatement, and the ingest maintenance config — one α so
   *  the streamed read can share the batch oracle verbatim. */
  val DdsAlpha: Double = 0.02

  /** The metric#day composite-key contract of the daily DDS grain —
   *  the ONE holder of the '#' separator shared by the ingest keyExpr
   *  (StreamQueries' DdsConfig), the batch build, and every serving
   *  decode. Metric names must not contain '#' (event types never do). */
  val DdsDailyKeyExpr: String =
    "concat_ws('#', metric, cast(ts - ts % 86400 as string))"

  /** Part `i` of a composite dds key (0 = metric, 1 = day epoch). */
  private[queries] def ddsKeyPart(i: Int): org.apache.spark.sql.Column =
    split(col("key"), "#").getItem(i)

  /** Serving decode of a per-day walk's output back to columns. */
  private[queries] def ddsDailyDecode(df: DataFrame): DataFrame =
    df.select(ddsKeyPart(0).as("metric"),
      ddsKeyPart(1).cast("long").as("bucket_ts"),
      col("est_v").as("p99_est"))

  /** DuckDB restatement of the DDSketch bucket relation at accuracy α
   *  (graft.operators.QuantileSketch cell for cell): the ceil(ln/ln γ)
   *  bucketing over the three sign stores, the sgn-then-sgn·idx walk
   *  order, and per-metric totals. γ is the Scala-computed double
   *  embedded at shortest-repr precision, so both engines divide and
   *  exponentiate by the identical IEEE value. */
  private[queries] def ddsCtes(alpha: Double, extraWhere: String = ""): String = {
    val g = graft.operators.QuantileSketch.gamma(alpha)
    s"""vals AS (SELECT metric, value AS v FROM points
       |         WHERE value IS NOT NULL AND isfinite(value)$extraWhere),
       |b AS (SELECT metric,
       |        CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sgn,
       |        CASE WHEN v = 0 THEN 0
       |             ELSE CAST(ceil(ln(abs(v)) / ln($g)) AS BIGINT) END AS idx,
       |        count(*) AS cnt
       |      FROM vals GROUP BY 1, 2, 3),
       |c AS (SELECT metric, sgn, idx, cnt,
       |        sum(cnt) OVER (PARTITION BY metric ORDER BY sgn, sgn * idx) AS cum
       |      FROM b),
       |n AS (SELECT metric, sum(cnt) AS n FROM b GROUP BY 1)""".stripMargin
  }

  /** The bucket γ-midpoint restated (QuantileSketch.midpoint). */
  private[queries] def ddsEst(alpha: Double): String = {
    val g = graft.operators.QuantileSketch.gamma(alpha)
    s"CASE WHEN sgn = 0 THEN 0.0 ELSE sgn * 2.0 * power($g, idx) / ${g + 1.0} END"
  }

  /** The synthetic histogram bucketing shared by the bucket-quantile
   *  family: event values bin into fixed-bound latency buckets whose
   *  counts are stored one metric per bucket, bounds in the metric name
   *  (exactly the counter shape the upstream BucketQuantileConfig node
   *  parses). */
  private val bucketMetricExpr: org.apache.spark.sql.Column =
    when(col("value") < 1, "lat_0_1")
      .when(col("value") < 5, "lat_1_5")
      .when(col("value") < 20, "lat_5_20")
      .when(col("value") < 50, "lat_20_50")
      .when(col("value") < 100, "lat_50_100")
      .when(col("value") < 250, "lat_100_250")
      .otherwise("lat_250_inf")

  /** Prometheus-style CUMULATIVE "le" counters per (user, day): the
   *  per-bucket counts converted to running totals in bucket-bound
   *  order — the other stored-counter shape the node accepts. */
  private def cumulativeCounters(s: SparkSession, d: String): DataFrame = {
    val bucketOrd = when(col("value") < 1, 0).when(col("value") < 5, 1)
      .when(col("value") < 20, 2).when(col("value") < 50, 3)
      .when(col("value") < 100, 4).when(col("value") < 250, 5).otherwise(6)
    val counts = prepared(s, d)
      .withColumn("metric", bucketMetricExpr).withColumn("__ord", bucketOrd)
      .groupBy(col("metric"), col("__ord"), col("tags")("user").as("tag_user"),
        (col("ts") - col("ts") % 86400).as("bucket_ts"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag_user"), col("bucket_ts")).orderBy(col("__ord").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts
      .withColumn("value", sum(col("__n")).over(wc))
      .select(col("metric"), col("tag_user"), col("bucket_ts"), col("value"))
  }

  /** STORED cumulative "le" counter SERIES — the shape a collector
   *  actually writes and the engine then reads as a plain source (the
   *  upstream precedent: stored aggregate streams read directly,
   *  aerospike/.../GorillaDownSampledTimeSeriesEncoder.java:138-180):
   *  per (user, day) and bucket bound, a monotone running count of
   *  events with value below the bound, sampled at every event arrival,
   *  daily reset. A downsample `last` per day therefore reads the
   *  end-of-day totals — identical numbers to [[cumulativeCounters]],
   *  but arriving as raw points through the FULL `run()` pipeline.
   *  Timestamps are distinct per series by construction (one point per
   *  distinct event ts), so `assumeDeduped` applies. */
  private def storedCumulativeCounters(s: SparkSession, d: String): DataFrame = {
    // ONE hash aggregate over fact rows computes ALL seven per-ts bucket
    // counts as columns, ONE window pass accumulates the seven running
    // totals, and the ×7 bucket explosion happens LAST, at aggregated
    // (user, ts) scale — the former shape crossJoined the 7-row bound dim
    // BEFORE the aggregate, paying the groupBy exchange and the window
    // sort on 7× fact-sized input (interleaved same-JVM A/B at sf0.1:
    // source build 1.09 → 0.55 s warm; the full declared query is a
    // wash at this scale because the shared dedupe+run pipeline
    // dominates — the build's 7× exchange/sort input is what grows with
    // the fact table). The overflow bound counts EVERY row
    // (bucketMetricExpr's `.otherwise` semantics — `x < inf` alone would
    // miss a NaN), hence count(*) rather than a `< inf` predicate.
    val names = Seq("lat_0_1", "lat_1_5", "lat_5_20", "lat_20_50",
      "lat_50_100", "lat_100_250", "lat_250_inf")
    val his = Seq(1.0, 5.0, 20.0, 50.0, 100.0, 250.0)
    val cnts = his.zipWithIndex.map { case (hi, i) =>
      sum(when(col("value") < hi, 1L).otherwise(0L)).as(s"__c$i")
    } :+ count(lit(1)).as("__c6")
    val perTs = prepared(s, d)
      .select(col("tags")("user").as("tag_user"),
        (col("ts") - col("ts") % 86400).as("day"), col("ts"), col("value"))
      .groupBy(col("tag_user"), col("day"), col("ts"))
      .agg(cnts.head, cnts.tail: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag_user"), col("day"))
      .orderBy(col("ts").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cums = (0 to 6).map(i => sum(col(s"__c$i")).over(w).cast("double").as(s"__v$i"))
    val counterTags = map(lit("user"), col("tag_user"))
    perTs
      .select(Seq(col("tag_user"), col("ts")) ++ cums: _*)
      .select(col("tag_user"), col("ts"),
        posexplode(array((0 to 6).map(i => col(s"__v$i")): _*)).as(Seq("__i", "value")))
      .withColumn("metric", element_at(array(names.map(lit): _*), col("__i") + 1))
      .select(col("metric"), counterTags.as("tags"), col("ts"), col("value"))
      .withColumn("series_id",
        graft.core.SeriesId.seriesId(col("metric"), col("tags")))
  }

  /** Standard per-series downsample output shape. */
  private def dsOut(df: DataFrame, valueName: String, scale: Int = 4): DataFrame =
    df.select(
      col("metric"),
      col("tags")("user").as("tag_user"),
      col("bucket_ts"),
      round(col("value"), scale).as(valueName))

  private val matchAllQ =
    (ds: DownsampleSpec) => TsdbQuery(MatchAll, Start, End, downsample = Some(ds))

  // ---------------------------------------------------------------- A1-A9

  val defs: Map[String, Q] = Map(
    // A1: downsample SUM (zimsum is the NaN-skipping alias — same result here)
    "q_ds_sum" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "sum"))), "sum_value")),

    // the SAME query as ANSI SQL text over the facade's registered
    // views (round 11 — Graft.registerViews, previously un-oracled):
    // Catalyst inlines the view, so this compiles to the DataFrame
    // path's plan; the SQL states the engine contracts explicitly
    // (LWW max-seq winner, NaN-as-missing) and shares q_ds_sum's
    // oracle verbatim — a SQL phrasing that drifts from the engine
    // semantics by one row fails the hash.
    "q_sql_ds_sum" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        s"""WITH dedup AS (
           |  SELECT * FROM (
           |    SELECT metric, tags, ts, value,
           |           row_number() OVER (PARTITION BY series_id, ts
           |                              ORDER BY seq DESC) AS __rn
           |    FROM graft_points
           |    WHERE ts >= $Start AND ts < $End)
           |  WHERE __rn = 1)
           |SELECT metric, tags['user'] AS tag_user,
           |       ts - ts % 86400 AS bucket_ts,
           |       round(sum(CASE WHEN isnan(value) THEN CAST(NULL AS DOUBLE)
           |                      ELSE value END), 4) AS sum_value
           |FROM dedup GROUP BY 1, 2, 3""".stripMargin)
    },

    // The TWO-STAGE group-by as plain SQL over the facade views
    // (round 12 — the SQL-access breadth item: a SQL user's first
    // queries are group-by, rate, and events search). States the
    // engine's two-stage contract explicitly — per-SERIES temporal
    // buckets rounded to 4 decimals BEFORE the cross-series sum (the
    // one mid-pipeline rounding point both engines share) — and
    // shares q_groupby's oracle verbatim; collapsing the stages into
    // one flat GROUP BY host, colo would round differently and fail
    // the hash.
    "q_sql_groupby" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        s"""WITH dedup AS (
           |  SELECT * FROM (
           |    SELECT series_id, tags, ts, value,
           |           row_number() OVER (PARTITION BY series_id, ts
           |                              ORDER BY seq DESC) AS __rn
           |    FROM graft_points
           |    WHERE ts >= $Start AND ts < $End)
           |  WHERE __rn = 1),
           |ds AS (
           |  SELECT series_id, tags['host'] AS tag_host, tags['colo'] AS tag_colo,
           |         ts - ts % 86400 AS bucket_ts,
           |         round(sum(CASE WHEN isnan(value) THEN CAST(NULL AS DOUBLE)
           |                        ELSE value END), 4) AS v
           |  FROM dedup GROUP BY 1, 2, 3, 4)
           |SELECT tag_host, tag_colo, bucket_ts, round(sum(v), 4) AS value
           |FROM ds GROUP BY 1, 2, 3""".stripMargin)
    },

    // The rate derivative as plain SQL over the facade views (round
    // 12): LWW dedupe, per-series lag chain, Δv/Δt with the first
    // point dropped — q_rate's oracle verbatim. The NULL-rate filter
    // restates the engine's NaN-as-missing contract (a NaN endpoint
    // yields a NULL rate, which run() drops).
    "q_sql_rate" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        s"""WITH dedup AS (
           |  SELECT * FROM (
           |    SELECT series_id, metric, tags, ts,
           |           CASE WHEN isnan(value) THEN CAST(NULL AS DOUBLE)
           |                ELSE value END AS value,
           |           row_number() OVER (PARTITION BY series_id, ts
           |                              ORDER BY seq DESC) AS __rn
           |    FROM graft_points
           |    WHERE ts >= $Start AND ts < $End)
           |  WHERE __rn = 1),
           |laged AS (
           |  SELECT metric, tags['user'] AS tag_user, ts,
           |         (value - lag(value) OVER w)
           |           / CAST(ts - lag(ts) OVER w AS DOUBLE) AS r,
           |         lag(ts) OVER w AS pt
           |  FROM dedup
           |  WINDOW w AS (PARTITION BY series_id ORDER BY ts))
           |SELECT metric, tag_user, ts, round(r, 6) AS rate
           |FROM laged WHERE pt IS NOT NULL AND r IS NOT NULL""".stripMargin)
    },

    // The last-value query as plain SQL over the facade views (round
    // 12): one ranked window per series, LWW on (ts, seq) — the same
    // winner Latest's max_by((ts, seq)) picks — and q_latest's oracle
    // verbatim. The dashboard "current value" a SQL user writes first.
    "q_sql_latest" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        s"""SELECT metric, tags['user'] AS tag_user, tags['host'] AS tag_host,
           |       tags['colo'] AS tag_colo, ts AS last_ts,
           |       round(value, 4) AS last_value
           |FROM (SELECT *, row_number() OVER (PARTITION BY series_id
           |                                   ORDER BY ts DESC, seq DESC) AS __rn
           |      FROM graft_points)
           |WHERE __rn = 1""".stripMargin)
    },

    // `auto` downsample interval (the upstream DownsampleFactory
    // mechanism: "auto" resolves against a duration→interval ladder
    // before the node plans). This 20-day range resolves to "1d" on the
    // default ladder, so the oracle is q_ds_sum's VERBATIM — a wrong
    // rung or an unresolved "auto" fails the hash (toSeconds("auto")
    // throws). Rung boundaries are spec-pinned in IntervalsSpec.
    "q_ds_auto" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("auto", "sum"))), "sum_value")),

    // S5 ALTERNATIVE STRATEGY through the full pipeline: the spill-free
    // hash-aggregate LWW dedupe (QueryEngine.dedupeAgg, selected via
    // spark.graft.dedupe.strategy=hashagg) — winners are bit-identical
    // to the window path, so this shares q_ds_sum's oracle verbatim.
    // The strategy is read at plan build, so the conf flips around the
    // DataFrame construction only.
    "q_ds_sum_hashdedup" -> { (s, d) =>
      try {
        s.conf.set("spark.graft.dedupe.strategy", "hashagg")
        dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "sum"))), "sum_value")
      } finally s.conf.unset("spark.graft.dedupe.strategy")
    },

    // Calendar-aligned downsample (upstream DownsampleConfig.timezone):
    // daily buckets at DENVER local midnight — epoch labels sit at
    // 07:00 UTC (MST, UTC-7; the whole January range is one DST
    // segment, so the driver-resolved offset CASE folds to a constant
    // and the oracle restates the identical -25200 arithmetic). Rows
    // straddling UTC midnight regroup vs q_ds_sum, so a silently
    // ignored timezone fails the hash.
    "q_ds_tz" -> ((s, d) => dsOut(
      run(s, d, matchAllQ(DownsampleSpec("1d", "sum", timezone = Some("America/Denver")))),
      "sum_value")),

    // CALENDAR interval "1n" (round 11 — upstream duration grammar `n` =
    // months, `y` = years; no fixed second length, so buckets come from
    // driver-enumerated civil-calendar boundaries compiled to a literal
    // CASE, QueryEngine.calendarBucket). UTC monthly over the extended
    // window: every row labels at JANUARY 1 — *below* the query start
    // (Jan 5), pinning the floor-to-calendar-start semantic that no
    // epoch arithmetic (ts - ts % 30d ≈ Jan 5 anchor) reproduces.
    "q_ds_month" -> ((s, d) => dsOut(
      run(s, d, TsdbQuery(MatchAll, Start, TzFillEnd,
        downsample = Some(DownsampleSpec("1n", "sum")))), "sum_value")),

    // monthly × TIMEZONE: Denver month starts at local midnight (07:00
    // UTC). The UTC-January rows before Jan 1 07:00Z belong to Denver's
    // DECEMBER 2023 — a month bucket the UTC path never emits, so a
    // silently ignored zone (or an offset applied to the wrong side)
    // fails the hash. Oracle restates the literal boundary CASE.
    "q_ds_month_tz" -> ((s, d) => dsOut(
      run(s, d, TsdbQuery(MatchAll, DataStart, TzFillEnd,
        downsample = Some(DownsampleSpec("1n", "sum",
          timezone = Some("America/Denver"))))), "sum_value")),

    // "3n" = calendar QUARTERS, anchored at the epoch calendar (month
    // index ≡ 0 mod 3 → Jan/Apr/Jul/Oct) — the same early-January rows
    // now label at OCTOBER 1 2023 (Q4), not December 1, so the oracle
    // hash pins the anchoring rule, not just the boundary walk.
    "q_ds_quarter_tz" -> ((s, d) => dsOut(
      run(s, d, TsdbQuery(MatchAll, DataStart, TzFillEnd,
        downsample = Some(DownsampleSpec("3n", "sum",
          timezone = Some("America/Denver"))))), "sum_value")),

    // "1y": the same rows split across Denver's 2023/2024 YEAR buckets
    "q_ds_year_tz" -> ((s, d) => dsOut(
      run(s, d, TsdbQuery(MatchAll, DataStart, TzFillEnd,
        downsample = Some(DownsampleSpec("1y", "sum",
          timezone = Some("America/Denver"))))), "sum_value")),

    // FILL × CALENDAR: the dense grid must enumerate the same boundary
    // list the bucketing emits (Dec'23–Mar'24 for this range); data
    // stops Feb 1 so the Feb and Mar Denver months are grid-only rows,
    // zero-filled — absent (or epoch-arithmetic) grid labels fail the
    // hash on those rows.
    "q_fill_month_tz" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, DataStart, TzFillEnd,
        downsample = Some(DownsampleSpec("1n", "sum",
          timezone = Some("America/Denver"))),
        fill = Some(FillSpec(policy = "zero")))
      run(s, d, q)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // the calendar interval arriving as client JSON — "1n" + timezone
    // through the parser; shares q_ds_month_tz's oracle verbatim
    "q_json_ds_month_tz" -> { (s, d) =>
      val json = s"""{
        "start": $DataStart, "end": $TzFillEnd,
        "downsample": {"interval": "1n", "aggregator": "sum", "timezone": "America/Denver"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "sum_value")
    },

    // the multi-month count through the parser ("3n" quarters) — the
    // n>1 anchoring is parser-reachable too; q_ds_quarter_tz verbatim
    "q_json_ds_quarter_tz" -> { (s, d) =>
      val json = s"""{
        "start": $DataStart, "end": $TzFillEnd,
        "downsample": {"interval": "3n", "aggregator": "sum", "timezone": "America/Denver"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "sum_value")
    },

    // FILL × CALENDAR with a REAL-value policy: prefer_previous over
    // the monthly Denver grid — data stops Feb 1, so the empty Feb and
    // Mar buckets carry January's value forward (grid labels AND the
    // neighbour walk both run on the boundary list)
    "q_fill_month_prev_tz" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, DataStart, TzFillEnd,
        downsample = Some(DownsampleSpec("1n", "sum",
          timezone = Some("America/Denver"))),
        fill = Some(FillSpec(policy = "null", real = Some("prefer_previous"))))
      run(s, d, q)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // A2 + A4: AVG and COUNT per interval (one pass; the avg output is
    // defined as round4(sum)/count so both engines divide bit-identical
    // doubles — raw avg() is exercised in unit tests)
    "q_ds_avg" -> { (s, d) =>
      QueryEngine.downsampleMulti(prepared(s, d), "1d", Start, End,
        Seq("__sum" -> "sum", "cnt" -> "count"))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(round(col("__sum"), 4) / col("cnt"), 4).as("avg_value"), col("cnt"))
    },

    // A5: MIN / MAX (mimmin/mimmax aliases), one pass
    "q_ds_minmax" -> { (s, d) =>
      QueryEngine.downsampleMulti(prepared(s, d), "1d", Start, End,
        Seq("min_value" -> "min", "max_value" -> "max"))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("min_value"), 4).as("min_value"),
          round(col("max_value"), 4).as("max_value"))
    },

    // A6: LAST (last value in interval by time order)
    "q_ds_last" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "last"))), "last_value")),

    // A6 sibling: FIRST (first value in interval by time order — the
    // upstream aggregator vocabulary's symmetric twin of LAST)
    "q_ds_first" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "first"))), "first_value")),

    // A7 vocabulary: DEV (sample standard deviation per interval;
    // single-point buckets are NULL in both engines)
    "q_ds_dev" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "dev"))), "dev_value")),

    // A7: NON_OPTIMIZED plugin aggregator — exact median over buffered interval values
    "q_ds_median" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "median"))), "median_value")),

    // A7 percentile family (pNN name → exact interpolated percentile)
    "q_ds_p90" -> ((s, d) => dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "p90"))), "p90_value")),

    // P1/A7 CUSTOM plugin path: an aggregator registered at runtime
    // resolves through the same registry as built-ins (the reference's
    // NumericAggregatorFactory plugin lookup) and composes with the
    // engine's grouping — the registration itself is the operator under
    // test here
    "q_ds_range_plugin" -> { (s, d) =>
      graft.query.Aggregators.register("range", (v, _, _, _) => max(v) - min(v))
      dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "range"))), "range_value")
    },

    // A7/P1 SCALE PATH: exact percentile over a DETERMINISTIC 1/m hash
    // sample. Exact per-bucket percentiles buffer every interval value —
    // at 100 TB a hot bucket's buffer is unbounded. approx_percentile's
    // sketch merge is order-sensitive (not cross-engine replayable), so
    // the bounded-memory path here is the md5-seeded systematic sample
    // the ingest admission already uses (Config.admissionSampleMod
    // precedent): rows whose md5prefix28(ts) ≡ 0 (mod m) — a pure
    // function of the data, so any engine replays it and reruns are
    // stable. Registered through the SAME plugin registry as every
    // other aggregator (the NumericAggregatorFactory contract).
    "q_ds_p95_sampled" -> { (s, d) =>
      graft.query.Aggregators.register("p95_sampled", (v, ts, _, _) =>
        percentile(when(pmod(call_function("md5prefix28", ts.cast("string")),
          lit(4)) === 0, v), lit(0.95)))
      dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "p95_sampled"))), "p95_sampled")
    },

    // A7/A15 SKETCH PATH (round 11, completes the sketch family —
    // KMV cardinality, count-min frequency, DDSketch QUANTILES): per-
    // metric quantile estimates from the mergeable relative-error
    // bucket relation (Masson et al. 2019). The bucket build collapses
    // to ≤ metrics × ~2·log_γ(range) rows before the exchange and the
    // walk windows over that summary — nothing fact-sized passes the
    // shuffle. The oracle restates the identical ceil(ln/ln γ)
    // bucketing, walk order, and rank convention cell for cell.
    "q_dds_quantiles" -> { (s, d) =>
      import graft.operators.QuantileSketch
      QuantileSketch.quantiles(
        QuantileSketch.sketch(pts(s, d), col("metric"), col("value"), DdsAlpha),
        Seq(0.5, 0.9, 0.99), DdsAlpha)
        .select(col("key").as("metric"), col("q"), col("est_v"))
    },

    // DDSketch at the DASHBOARD grain: p99 per (metric, day) from
    // per-day bucket relations — the shape a latency dashboard serves
    // at 100 TB (and what the ingest maintains: q_stream_dds_daily
    // reads the same answer from STORED per-batch partials). The
    // composite key is a string concat so the sketch API stays
    // single-keyed; the walk partitions per (metric, day).
    "q_dds_daily" -> { (s, d) =>
      import graft.operators.QuantileSketch
      val buckets = QuantileSketch.sketch(pts(s, d),
        expr(DdsDailyKeyExpr), col("value"), DdsAlpha)
      ddsDailyDecode(QuantileSketch.quantiles(buckets, Seq(0.99), DdsAlpha))
    },

    // DDSketch estimator-quality report (the minhashEval / cms-report
    // discipline): exact interpolated p90 beside the sketch estimate at
    // a deliberately coarse α = 5% so the geometric-bucket gap is real
    // and the hash pins the ESTIMATOR, not just the exact side.
    "q_dds_eval" -> { (s, d) =>
      graft.operators.QuantileSketch
        .report(pts(s, d), col("metric"), col("value"), q = 0.9, alpha = 0.05)
        .select(col("key").as("metric"), col("q"), col("exact_v"), col("est_v"))
    },

    // The sketch walk as PLAIN SQL over the facade's views (the
    // q_sql_ds_sum discipline): a SQL user can state the whole DDSketch
    // contract — three sign stores, γ-bucketing, walk order, rank
    // convention — as one query; Catalyst gives it the same plan family
    // as the DataFrame path. Shares q_dds_quantiles' oracle verbatim.
    "q_sql_dds_quantiles" -> { (s, d) =>
      graft.Graft.registerViews(s, d)
      val g = graft.operators.QuantileSketch.gamma(DdsAlpha)
      s.sql(
        s"""WITH vals AS (
           |  SELECT metric, value AS v FROM graft_points
           |  WHERE value IS NOT NULL AND NOT isnan(value)
           |    AND abs(value) != double('Infinity')),
           |b AS (SELECT metric,
           |        CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sgn,
           |        CASE WHEN v = 0 THEN 0L
           |             ELSE CAST(ceil(ln(abs(v)) / ln(${g}D)) AS BIGINT) END AS idx,
           |        count(*) AS cnt
           |      FROM vals GROUP BY 1, 2, 3),
           |c AS (SELECT metric, sgn, idx, cnt,
           |        sum(cnt) OVER (PARTITION BY metric ORDER BY sgn, sgn * idx) AS cum
           |      FROM b),
           |t AS (SELECT metric, sum(cnt) AS total FROM b GROUP BY 1),
           |qs AS (SELECT explode(array(0.5D, 0.9D, 0.99D)) AS q),
           |sel AS (SELECT c.metric, qs.q,
           |          min_by(CASE WHEN sgn = 0 THEN 0.0D
           |                      ELSE sgn * 2.0D * power(${g}D, idx) / ${g + 1.0}D
           |                 END, cum) AS est
           |        FROM c JOIN t USING (metric) CROSS JOIN qs
           |        WHERE cum > floor(q * (total - 1))
           |        GROUP BY 1, 2)
           |SELECT metric, q, round(est, 4) AS est_v FROM sel""".stripMargin)
    },

    // A8: runAll — single interval spanning the whole query range
    "q_ds_runall" -> { (s, d) =>
      QueryEngine.downsampleMulti(prepared(s, d), "0all", Start, End,
        Seq("__sum" -> "sum", "__cnt" -> "count"), runAll = true)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(round(col("__sum"), 4) / col("__cnt"), 4).as("avg_value"))
    },

    // A3: reporting average — the engine's reportingInterval branch
    // (QueryEngine.temporalAgg: sum / (interval/reporting)). Reporting
    // interval 3200s ⇒ odd divisor 27, so a sum with 2-decimal inputs can
    // never land exactly on a 4-decimal rounding boundary — keeps the
    // cross-engine compare deterministic without double-rounding.
    "q_ds_reporting_avg" -> ((s, d) =>
      dsOut(run(s, d, matchAllQ(
        DownsampleSpec("1d", "avg", reportingInterval = Some("3200s")))), "rep_avg")),

    // A2 via the full engine path (plain avg through QueryEngine.run)
    "q_ds_avg_run" -> ((s, d) =>
      dsOut(run(s, d, matchAllQ(DownsampleSpec("1d", "avg"))), "avg_value")),

    // A9: infectious NaN — any NaN in an interval makes the interval NaN
    // (reference :465-473). NaNs are injected deterministically
    // (TsdbViews.pointsWithNan); output maps NaN→NULL for hash stability.
    "q_ds_infectious_nan" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "sum", infectiousNan = true)))
      QueryEngine.run(TsdbViews.pointsWithNan(s, d), q)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          when(isnan(col("value")), lit(null).cast("double"))
            .otherwise(round(col("value"), 4)).as("sum_value"))
    },

    // Dense interval arrays: every (series, bucket) cell exists, missing
    // buckets NaN-filled (reference dense double[] output shape; NaN →
    // NULL in the wrapper for hash stability)
    "q_ds_dense" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
      QueryEngine.denseFill(ds, "1d", Start, End)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          when(isnan(col("value")), lit(null).cast("double"))
            .otherwise(round(col("value"), 4)).as("sum_value"))
    },

    // FillPolicy ZERO/SCALAR: the same dense grid with absent buckets
    // materialized as 0 and as a sentinel scalar (both exactly
    // representable, so the fill constant is engine-identical)
    "q_ds_dense_zero" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
      QueryEngine.denseFill(ds, "1d", Start, End, fill = "zero")
        .join(QueryEngine.denseFill(ds, "1d", Start, End, fill = "scalar", fillScalar = -1.5)
            .select(col("series_id"), col("bucket_ts"), col("value").as("__sc")),
          Seq("series_id", "bucket_ts"))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_zero"), round(col("__sc"), 4).as("sum_scalar"))
    },

    // FillWithRealPolicy — the reference's SECOND fill axis, configured
    // alongside the constant policy on the query node's interpolator
    // (aura EphemeralAuraFactory.java:227-228): a missing bucket takes
    // the series' nearest REAL value instead of a constant. Both
    // one-sided modes in one row: `previous` stays NULL before the
    // series' first real bucket, `next` after its last. Downsample
    // values are rounded BEFORE the fill so the copied values are
    // engine-identical.
    "q_ds_fill_previous" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.denseFill(ds, "1d", Start, End, fill = "null",
          realFill = Some("previous"))
        .join(QueryEngine.denseFill(ds, "1d", Start, End, fill = "null",
              realFill = Some("next"))
            .select(col("series_id"), col("bucket_ts"), col("value").as("__nx")),
          Seq("series_id", "bucket_ts"))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          col("value").as("sum_prev"), col("__nx").as("sum_next"))
    },

    // LERP — the upstream linear interpolator: a missing bucket gets
    // prev + (next − prev) · Δt-fraction between its two real
    // neighbours; grid edges (one side missing) stay NULL. Inputs are
    // rounded before interpolation and the oracle restates the exact
    // same IEEE expression order, so the interpolated doubles are
    // bit-identical before the final deterministic-FP round(6).
    "q_ds_fill_lerp" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.denseFill(ds, "1d", Start, End, fill = "null",
          realFill = Some("lerp"))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 6).as("sum_lerp"))
    },

    // FILL × TIMEZONE (round 11 — the upstream DownsampleConfig keeps
    // timezone and fill policy as sibling fields, so they must compose):
    // Denver local-midnight daily buckets on a range extended across the
    // 2024 SPRING-FORWARD, prefer_previous fill. Data stops Feb 1, so
    // every later grid slot carries the previous real value forward —
    // meaning the fill GRID LABELS are what's under test: they must
    // follow the zone segments (07:00 UTC labels in winter, 06:00 after
    // Mar 10, the 23h day one slot) or rows hash-mismatch. The oracle
    // restates the two-segment label walk with literal offsets.
    "q_ds_fill_tz" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, Start, TzFillEnd,
        downsample = Some(DownsampleSpec("1d", "sum", timezone = Some("America/Denver"))),
        fill = Some(FillSpec(policy = "null", real = Some("prefer_previous"))))
      run(s, d, q)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // the same composition arriving as client JSON — timezone and fill
    // are sibling downsample/fill fields in one document; shares
    // q_ds_fill_tz's oracle verbatim
    "q_json_fill_tz" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $TzFillEnd,
        "downsample": {"interval": "1d", "aggregator": "sum", "timezone": "America/Denver"},
        "fill": {"policy": "null", "real": "prefer_previous"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // PREFER_PREVIOUS through the full run() pipeline: previous real
    // value, else next, else the constant policy (NULL here). Rounding
    // commutes with the copy (no arithmetic on the filled value), so
    // this rounds at output like every other run() query.
    "q_ds_fill_prefer" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "sum")),
        fill = Some(FillSpec(policy = "null", real = Some("prefer_previous"))))
      run(s, d, q)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // A11 + FillWithRealPolicy: INTERPOLATED spatial aggregation — the
    // upstream interpolatorConfigs semantic (each query node carries a
    // LERP numeric interpolator so cross-series aggregation at a
    // timestamp one series didn't report sees its interpolated value,
    // not a hole). Composition: downsample → per-series lerp fill
    // (grid edges take the constant ZERO policy, the interpolator's
    // fillPolicy) → group-by sum. Stage-wise rounding (4dp entering the
    // fill, 6dp on interpolated cells) keeps every interim double
    // engine-identical, the fill-family discipline.
    "q_groupby_lerp" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      val filled = QueryEngine.denseFill(ds, "1d", Start, End, fill = "zero",
          realFill = Some("lerp"))
        .withColumn("value", round(col("value"), 6))
      QueryEngine.groupBySpatial(filled, GroupBySpec(Seq("host", "colo"), "sum"))
        .select(col("host").as("tag_host"), col("colo").as("tag_colo"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // S8+U3: the query-range scan as a union of "hot" (recent segments)
    // and "cold" (older partitions = the LTS analog) sources, merged and
    // deduped — totals must equal the single-source scan
    "q_hot_cold_union" -> { (s, d) =>
      val split = 1705276800L // 2024-01-15: hot/cold partition boundary
      val p = pts(s, d).filter(col("ts") >= lit(Start) && col("ts") < lit(End))
      val cold = p.filter(col("segment_start") < lit(split))
      val hot = p.filter(col("segment_start") >= lit(split))
      val merged = QueryEngine.dedupe(cold.unionByName(hot))
      dsOut(QueryEngine.downsample(merged, DownsampleSpec("1d", "sum"), Start, End), "sum_value")
    },

    // J3: a series_id-keyed aggregate resolved back to display strings
    // via a broadcast dictionary join on series_dim
    "q_dict_resolve" -> { (s, d) =>
      val p = pts(s, d)
      val agg = QueryEngine.downsample(
        QueryEngine.dedupe(p.filter(col("ts") >= lit(Start) && col("ts") < lit(End))),
        DownsampleSpec("1d", "sum"), Start, End)
        .select("series_id", "bucket_ts", "value") // strings dropped: ids only
      graft.operators.Resolve.resolveSeries(agg, TsdbViews.seriesDim(p))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // J4: meta-resolved groups × fact join, aggregated per group
    "q_groups_fact" -> { (s, d) =>
      val p = pts(s, d)
      val joined = graft.operators.Resolve.groupsFactJoin(
        p.filter(col("ts") >= lit(Start) && col("ts") < lit(End)),
        TsdbViews.seriesDim(p), TagLiteral("colo", Seq("sjc")), Seq("host"))
      QueryEngine.dedupe(joined)
        .groupBy(col("g_host").as("tag_host"),
          (col("ts") - col("ts") % lit(86400L)).as("bucket_ts"))
        .agg(round(sum(col("value")), 4).as("sum_value"))
    },

    // ---------------------------------------------------------------- W1-W5

    // W1: rate — per-point derivative
    "q_rate" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End, rate = Some(RateSpec())))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("rate"))
    },

    // W3: deltaOnly — raw difference
    "q_rate_delta" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End, rate = Some(RateSpec(deltaOnly = true))))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("delta"))
    },

    // W2: counter semantics with dropResets (decreases dropped)
    "q_rate_counter" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End,
        rate = Some(RateSpec(counter = true, dropResets = true))))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("rate"))
    },

    // W2 via JSON: counter/dropResets options parse through the one
    // parser — shares q_rate_counter's oracle verbatim
    "q_json_rate_counter" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "rate": {"counter": true, "dropResets": true}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("rate"))
    },

    // A11+P1 via JSON: the groupBy aggregator is resolved BY NAME from
    // the same registry (the GroupByFactory contract), so "p95" flows
    // through the parser wherever "sum" does. What this pins is the
    // PARSER: the specs parsed from the JSON document drive the same
    // manual downsample+groupBySpatial composition as the direct query
    // (not run() — the mid-pipeline rounding point matches the oracle's
    // restated math), so a parser divergence fails the shared hash.
    "q_json_groupby_p95" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum"},
        "groupBy": {"tagKeys": ["host"], "aggregator": "p95"}
      }"""
      val q = TsdbJson.parseQuery(json)
      val ds = QueryEngine.downsample(prepared(s, d),
          q.downsample.get, Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, q.groupBy.get)
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("p95_value"))
    },

    // W2 (rollover path): counter rate with rollover arithmetic
    // (counterMax − prev + v over Δt on decrease, reference :444-455) and
    // the resetValue clamp (rate > resetValue ⇒ 0)
    "q_rate_counter_rollover" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End,
        rate = Some(RateSpec(counter = true, counterMax = 500.0, resetValue = 0.001))))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("rate"))
    },

    // W4: rate-to-count — v * min(Δt, mode-of-deltas)
    "q_rate_to_count" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End, rate = Some(RateSpec(rateToCount = true))))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("cnt_value"))
    },

    // Full pipeline composition: filter → shift → dedupe → rate →
    // downsample → spatial group-by, one declarative plan (the
    // reference's entire pushed-down query graph end-to-end)
    "q_full_pipeline" -> { (s, d) =>
      val f = Chain.and(
        MetricLiteral(Seq("click", "purchase")), TagLiteral("colo", Seq("sjc")))
      run(s, d, TsdbQuery(f, Start, End,
        rate = Some(RateSpec()),
        downsample = Some(DownsampleSpec("1d", "avg")),
        groupBy = Some(GroupBySpec(Seq("host"), "sum")),
        shift = Some("1w")))
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // the full composition over CALENDAR buckets: filter → 1w shift →
    // dedupe → rate → Denver MONTHLY avg → spatial host sum. Every
    // stage upstream of the bucket CASE is the q_full_pipeline plan;
    // the shifted February rows land in a third month bucket, so the
    // boundary walk is exercised under rate-rewritten timestamps too.
    "q_full_pipeline_month" -> { (s, d) =>
      val f = Chain.and(
        MetricLiteral(Seq("click", "purchase")), TagLiteral("colo", Seq("sjc")))
      run(s, d, TsdbQuery(f, DataStart, TzFillEnd,
        rate = Some(RateSpec()),
        downsample = Some(DownsampleSpec("1n", "avg",
          timezone = Some("America/Denver"))),
        groupBy = Some(GroupBySpec(Seq("host"), "sum")),
        shift = Some("1w")))
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // W5: time shift — evaluate one week back, map timestamps forward
    "q_timeshift" -> ((s, d) =>
      dsOut(
        run(s, d, TsdbQuery(MatchAll, Start, End,
          downsample = Some(DownsampleSpec("1d", "sum")), shift = Some("1w"))),
        "sum_value")),

    // ---------------------------------------------------------------- A11-A13

    // A11: spatial group-by over downsampled series (group keys = tag
    // values); intermediate snapped to 4 decimals between the temporal and
    // spatial stages for cross-engine bit-determinism
    "q_groupby" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("host", "colo"), "sum"))
        .select(col("host").as("tag_host"), col("colo").as("tag_colo"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // A11 × TIMEZONE (round 11): spatial group-by over a Denver
    // local-day downsample — "per-host daily sums on the local calendar",
    // the dashboard composition a tz user reaches first. The group-by
    // consumes whatever bucket labels the downsample emits, so this pins
    // that the zone labels survive the spatial stage unchanged.
    "q_groupby_tz" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d),
        DownsampleSpec("1d", "sum", timezone = Some("America/Denver")), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("host", "colo"), "sum"))
        .select(col("host").as("tag_host"), col("colo").as("tag_colo"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // spatial aggregation over CALENDAR buckets: per-series Denver
    // monthly sums feed the cross-series stage unchanged (labels are
    // opaque epochs to the spatial agg) — the early-January rows roll
    // into a December-2023 group row the UTC path never emits
    "q_groupby_month_tz" -> { (s, d) =>
      val pts0 = QueryEngine.dedupe(pts(s, d)
        .filter(col("ts") >= lit(DataStart) && col("ts") < lit(TzFillEnd)))
      val ds = QueryEngine.downsample(pts0,
        DownsampleSpec("1n", "sum", timezone = Some("America/Denver")),
        DataStart, TzFillEnd)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("host", "colo"), "sum"))
        .select(col("host").as("tag_host"), col("colo").as("tag_colo"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // Group-by over a SPARSE tag (env exists on 1-in-5 users): a series
    // missing the tag joins NO group — the reference groups through the
    // meta index's tag-value search, so absent-tag series are absent
    // from every group, not a null-keyed group (AerospikeQueryNode
    // .java:139-146). The oracle's `WHERE tag_env IS NOT NULL` states
    // the same drop; before round 10 the engine emitted Spark's null
    // group here and would fail this hash.
    "q_groupby_sparse" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("env"), "sum"))
        .select(col("env").as("tag_env"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // A11 + P1: cross-series PERCENTILE group-by — "p95 daily volume
    // across the host fleet", the upstream GroupByFactory resolving its
    // aggregator from the same plugin registry as the temporal side.
    // Per-series sums snap to 4 decimals entering the percentile so the
    // interpolation runs over identical doubles cross-engine.
    "q_groupby_p95" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("host"), "p95"))
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("p95_value"))
    },

    // A13: group-all — no group keys ⇒ single group per interval (spatial
    // max over snapped per-series sums: order-insensitive, bit-exact)
    "q_groupby_all" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .withColumn("value", round(col("value"), 4))
      QueryEngine.groupBySpatial(ds, GroupBySpec(Nil, "max"))
        .select(col("bucket_ts"), round(col("value"), 4).as("value"))
    },

    // A18: last-value query per series
    "q_latest" -> { (s, d) =>
      Latest(pts(s, d))
        .select(col("metric"), col("tags")("user").as("tag_user"),
          col("tags")("host").as("tag_host"), col("tags")("colo").as("tag_colo"),
          col("last_ts"), round(col("last_value"), 4).as("last_value"))
    },

    // A18 composed: absent/stale-series detection — the alerting
    // primitive (Prometheus absent(), staleness pages): series that
    // matched but whose LAST point predates the staleness horizon.
    // Same single max_by aggregate as q_latest, O(|series|) after the
    // map-side combine, one filter on its output — no second scan.
    "q_stale_series" -> { (s, d) =>
      Latest(pts(s, d).filter(col("ts") >= lit(Start) && col("ts") < lit(End)))
        .filter(col("last_ts") < lit(End - 3 * 86400))
        .select(col("metric"), col("tags")("user").as("tag_user"),
          col("last_ts"), round(col("last_value"), 4).as("last_value"))
    },

    // ---------------------------------------------------------------- F1-F9

    // F1+F4: literal metric + literal tag set
    "q_filter_literal" -> { (s, d) =>
      val f = Chain.and(
        MetricLiteral(Seq("click", "error")),
        TagLiteral("user", Seq("1", "2", "3")))
      dsOut(run(s, d, TsdbQuery(f, Start, End, downsample = Some(DownsampleSpec("1d", "count")))), "cnt")
    },

    // F2+F4: regex metric + regex tag (contains semantics)
    "q_filter_regex" -> { (s, d) =>
      val f = Chain.and(MetricRegexp("^(cl|pu)"), TagRegexp("host", "web0[01]"))
      dsOut(run(s, d, TsdbQuery(f, Start, End, downsample = Some(DownsampleSpec("1d", "sum")))), "sum_value")
    },

    // F3: wildcard filter (glob → regex at plan time)
    "q_filter_wildcard" -> { (s, d) =>
      val f = Chain.and(TagWildcard("host", "web*"), TagLiteral("colo", Seq("sjc")))
      dsOut(run(s, d, TsdbQuery(f, Start, End,
        downsample = Some(DownsampleSpec("0all", "sum", runAll = true)))), "sum_value")
    },

    // F7+F8: chain with NOT member (AND / OR / NOT combination)
    "q_filter_chain_not" -> { (s, d) =>
      val f = Chain.and(
        Chain.or(TagLiteral("user", Seq("1", "2", "3", "4", "5")), TagRegexp("host", "web02")),
        Not(TagLiteral("colo", Seq("den"))))
      dsOut(run(s, d, TsdbQuery(f, Start, End,
        downsample = Some(DownsampleSpec("0all", "count", runAll = true)))), "cnt")
    },

    // F5+F6: tag-key presence + any-key-or-value regex match
    "q_filter_tagkey_any" -> { (s, d) =>
      val f = Chain.and(TagKeyLiteral(Seq("host")), AnyMatch("sjc"))
      dsOut(run(s, d, TsdbQuery(f, Start, End,
        downsample = Some(DownsampleSpec("0all", "sum", runAll = true)))), "sum_value")
    },

    // J1: same selection as q_filter_literal but via the filter →
    // series_dim → broadcast-left-semi-join scan path (the reference
    // resolves series against the index before touching data,
    // TimeSeriesShard.java:706-716)
    "q_filter_semijoin" -> { (s, d) =>
      val f = Chain.and(
        MetricLiteral(Seq("click", "error")),
        TagLiteral("user", Seq("1", "2", "3")))
      val p = pts(s, d)
      val scanned = graft.lake.Lake.semiJoinScan(
        p.filter(col("ts") >= lit(Start) && col("ts") < lit(End)),
        TsdbViews.seriesDim(p), f)
      dsOut(QueryEngine.downsample(QueryEngine.dedupe(scanned),
        DownsampleSpec("1d", "count"), Start, End), "cnt")
    },

    // F9: explicit tags — series tag count must equal filter's tag-key count
    "q_filter_explicit" -> { (s, d) =>
      val f = Chain.and(
        TagLiteral("user", Seq("0", "1", "2", "3", "4", "5", "6", "7")),
        TagKeyLiteral(Seq("host", "colo")))
      dsOut(run(s, d, TsdbQuery(f, Start, End, explicitTags = true,
        downsample = Some(DownsampleSpec("0all", "count", runAll = true)))), "cnt")
    },

    // F9 via JSON: the top-level ExplicitTags wrapper sets the flag and
    // unwraps to the inner chain (QueryBuilderTSDBExt.java:64-66) —
    // shares q_filter_explicit's oracle verbatim
    "q_json_explicit" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "filter": {"type": "ExplicitTags", "filter":
          {"type": "Chain", "op": "AND", "filters": [
            {"type": "TagValueLiteralOr", "tagKey": "user",
             "filter": "0|1|2|3|4|5|6|7"},
            {"type": "TagKeyLiteralOr", "filter": "host|colo"}]}},
        "downsample": {"interval": "0all", "aggregator": "count"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "cnt")
    },

    // The OpenTSDB query-JSON front end (QueryBuilderTSDBExt.java:48-122
    // semantics): the SAME selection as q_filter_chain_not, but the whole
    // query — filter tree, range, downsample — arrives as a client JSON
    // document and replays through TsdbJson.parseQuery → QueryEngine.run
    // (oracle identical to q_filter_chain_not's)
    "q_json_chain_not" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "filter": {"type": "Chain", "op": "AND", "filters": [
          {"type": "Chain", "op": "OR", "filters": [
            {"type": "TagValueLiteralOr", "tagKey": "user", "filter": "1|2|3|4|5"},
            {"type": "TagValueRegex", "tagKey": "host", "filter": "web02"}]},
          {"type": "Not", "filter":
            {"type": "TagValueLiteralOr", "tagKey": "colo", "filter": "den"}}]},
        "downsample": {"interval": "0all", "aggregator": "count", "runAll": true}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "cnt")
    },

    // ------------------------------------------- upstream analytic nodes
    // (TSDB 3.x query-graph nodes above the storage source: sliding
    // window, topn, expression — the reference repo holds the source
    // half; these replay the public node semantics over its output)

    // Sliding-window moving average over per-series daily counts:
    // 3-bucket trailing mean. Counts are exact integers, so the window
    // mean is bit-identical FP in both engines (exact sum at any order,
    // one IEEE division).
    "q_ds_sliding_avg" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "count")),
        slidingWindow = Some(SlidingWindowSpec(3, "avg")))), "mov_avg")),

    // Sliding PERCENTILE (the plugin registry through the sliding node —
    // the upstream sliding-window factory resolves percentile aggregators
    // from the same registry as downsample/group-by): p90 over the
    // trailing 5 daily counts, integer-exact inputs so both engines
    // interpolate between identical order statistics.
    "q_ds_sliding_p90" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "count")),
        slidingWindow = Some(SlidingWindowSpec(5, "p90")))), "mov_p90")),

    // Sliding max over daily sums (trailing 3 buckets): max is
    // order-free, so the only FP license is the per-bucket sum itself —
    // the same rounded class as q_ds_sum.
    "q_ds_sliding_max" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "sum")),
        slidingWindow = Some(SlidingWindowSpec(3, "max")))), "mov_max")),

    // Top-n series: the 5 series with the largest range total keep all
    // their daily rows. Ranking is on the ROUNDED total with the series
    // name as tiebreak, so the cut is deterministic and replayable; the
    // n-row winner table broadcasts back onto the bucket rows.
    "q_topn_series" -> { (s, d) =>
      val ds = QueryEngine.downsample(prepared(s, d), DownsampleSpec("1d", "sum"), Start, End)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
      graft.operators.SeriesAnalytics.topN(ds, Seq("metric", "tag_user"), 5,
        valueCol = "sum_value")
    },

    // topn with the upstream config's non-default ranking aggregator
    // (TopNConfig.aggregator): groups ranked by their PEAK daily value
    // instead of their total — the "which series spiked" question.
    // Driven through the JSON front end so the parser's aggregator plumb
    // is the thing pinned; downsample `count` keeps the chained node
    // values integer-exact end-to-end (the q_json_sliding_topn
    // precedent for run()-chained analytics).
    "q_json_topn_max" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "topN": {"n": 5, "aggregator": "max"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("cnt"), col("series_total"))
    },

    // Cross-metric expression: error-rate = error sums / click sums per
    // user per day. Each operand snaps to 4 decimals before the join
    // (the q_groupby discipline), so the division runs over identical
    // doubles in both engines; zero denominators drop.
    "q_expr_ratio" -> { (s, d) =>
      def side(m: String): DataFrame = {
        val ds = run(s, d, TsdbQuery(MetricLiteral(Seq(m)), Start, End,
          downsample = Some(DownsampleSpec("1d", "sum"))))
          .withColumn("value", round(col("value"), 4))
        QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("user"), "sum"))
          .select(col("user").as("tag_user"), col("bucket_ts"),
            round(col("value"), 4).as("value"))
      }
      graft.operators.SeriesAnalytics.binary(
        side("error"), side("click"), Seq("tag_user"), "divide")
        .select(col("tag_user"), col("bucket_ts"), round(col("value"), 4).as("ratio"))
    },

    // The full analytic stack from one client JSON document: filter →
    // daily count → host group-by → sliding mean → top-2 hosts, through
    // the one parser.
    "q_json_sliding_topn" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "filter": {"type": "TagValueLiteralOr", "tagKey": "colo", "filter": "sjc"},
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["host"], "aggregator": "sum"},
        "slidingWindow": {"buckets": 3, "aggregator": "avg"},
        "topN": {"n": 2}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("mov_avg"), col("series_total"))
    },

    // The round-10 aggregator vocabulary through the ONE parser: the
    // JSON front end resolves the downsample aggregator by name from
    // the same registry, so `dev` (and `first`) need no parser change —
    // this row pins that claim with q_ds_dev's oracle verbatim
    "q_json_ds_dev" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "dev"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "dev_value")
    },

    // OpenTSDB's relative-time grammar through the front end: start
    // "20d-ago", end "now", resolved against a CALLER-SUPPLIED now (a
    // parameter, not wall-clock — parsing stays a pure value). now =
    // End makes the window identical to q_ds_sum's [Start, End), so the
    // oracle is shared verbatim and a mis-resolved relative time fails
    // the hash.
    "q_json_relative_time" -> { (s, d) =>
      val json = s"""{
        "start": "20d-ago", "end": "now",
        "downsample": {"interval": "1d", "aggregator": "sum"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json, now = End)), "sum_value")
    },

    // timezone through the JSON front end — shares q_ds_tz's oracle
    // verbatim, so a parser that drops the field regroups to UTC
    // midnights and fails the hash
    "q_json_ds_tz" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum",
                       "timezone": "America/Denver"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "sum_value")
    },

    // `auto` through the JSON front end: the client document carries the
    // literal interval "auto"; resolution happens inside run() (the one
    // shared resolution point), so this twin pins that the parser passes
    // "auto" through un-mangled — shares q_ds_sum's oracle verbatim
    "q_json_ds_auto" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "auto", "aggregator": "sum"}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "sum_value")
    },

    // Full pushed-down query graph from JSON: filter + rate + downsample +
    // groupBy + timeShift (the reference's absorbed source-node configs,
    // AuraMetricsSourceFactory.java:120-128); same oracle as q_full_pipeline
    "q_json_full" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "filter": {"type": "Chain", "op": "AND", "filters": [
          {"type": "MetricLiteral", "metric": "click|purchase"},
          {"type": "TagValueLiteralOr", "tagKey": "colo", "filter": "sjc"}]},
        "rate": {},
        "downsample": {"interval": "1d", "aggregator": "avg"},
        "groupBy": {"tagKeys": ["host"], "aggregator": "sum"},
        "timeShift": "1w"
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("host").as("tag_host"), col("bucket_ts"),
          round(col("value"), 4).as("value"))
    },

    // Summarizer node (terminal): per-user daily totals collapse to one
    // summary row per user — avg/max over the bucket values, the bucket
    // count, and the last bucket's value (max_by over the unique
    // bucket_ts). FP summaries snap to 4 decimals inside the node.
    "q_summarizer" -> ((s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "sum")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum")),
        summarizer = Some(SummarizerSpec(Seq("avg", "max", "count", "last")))))
        .select(col("user").as("tag_user"), col("avg_value"), col("max_value"),
          col("n_buckets"), col("last_value"))),

    // Percentile summaries (upstream SummarizerConfig's pNN vocabulary):
    // p95/p50 of each user's daily totals, the same exact-interpolation
    // percentile as the q_ds_p90 plugin contract.
    "q_summarizer_pct" -> ((s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "sum")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum")),
        summarizer = Some(SummarizerSpec(Seq("p95", "p50", "count")))))
        .select(col("user").as("tag_user"), col("p95_value"), col("p50_value"),
          col("n_buckets"))),

    // Ratio node: each user's share (%) of the all-user total per day.
    // The per-bucket total snaps to 4 decimals before the division
    // (broadcast back onto the series rows); surface rounds the quotient.
    "q_expr_percent" -> ((s, d) =>
      run(s, d, TsdbQuery(MetricLiteral(Seq("click")), Start, End,
        downsample = Some(DownsampleSpec("1d", "sum")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum")),
        ratio = Some(RatioSpec())))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("pct"))),

    // Anomaly node (deterministic restatement): each user's daily event
    // count z-scored against its own expanding history (mean/std over
    // strictly earlier buckets, snapped to 4 decimals before the
    // division); |z| >= 3 flags. First 3 buckets warm up (null z).
    "q_anomaly_zscore" -> { (s, d) =>
      val ds = run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "count")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum"))))
        .withColumn("value", round(col("value"), 4))
      graft.operators.SeriesAnalytics.zscore(ds, Seq(col("user")))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("zscore"), col("anomaly"))
    },

    // Moving-average node with exponential weighting (upstream TSDB 3.x
    // MovingAverageConfig, exponential=true): trailing-4-sample EWMA of
    // per-series daily counts, alpha=0.5 — dyadic weights (1, .5, .25,
    // .125) make every weighted sum of integer counts exact FP, so the
    // one terminal division replays bit-identically (the lag-chain, not
    // a windowed SUM, fixes the accumulation order cross-engine).
    "q_ds_ewma" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "count")),
        movingAverage = Some(MovingAverageSpec(4, 0.5)))), "ewma")),

    // The same EWMA node from a client JSON document — shares
    // q_ds_ewma's oracle verbatim (parser divergence = hash mismatch).
    "q_json_ewma" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "movingAverage": {"samples": 4, "alpha": 0.5}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "ewma")
    },

    // Simple (equal-weight) moving average — MovingAverageConfig with
    // exponential = false: trailing-4 mean, head windows renormalizing
    // over the lags that exist. Integer daily counts sum exactly in FP,
    // so the single terminal division replays bit-identically.
    "q_ds_movavg_simple" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "count")),
        movingAverage = Some(MovingAverageSpec(4, exponential = false)))), "mavg")),

    // The same simple-MA node from a client JSON document — shares
    // q_ds_movavg_simple's oracle verbatim.
    "q_json_movavg_simple" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "movingAverage": {"samples": 4, "exponential": false}
      }"""
      dsOut(run(s, d, TsdbJson.parseQuery(json)), "mavg")
    },

    // Time-difference processor (upstream TSDB 3.x TimeDifference):
    // per-point gap since the series' previous point, in minutes — the
    // heartbeat/liveness shape. First point of each series drops
    // (upstream emits null there). Integer-second deltas divide by one
    // literal, so values replay bit-identically.
    "q_ds_timediff" -> { (s, d) =>
      run(s, d, TsdbQuery(MatchAll, Start, End,
        timeDifference = Some(TimeDifferenceSpec("minutes"))))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("tdiff"))
    },

    // TimeDifference COMPOSED with downsample: mean inter-arrival gap
    // per series per day — the liveness dashboard number. Gaps are
    // integer seconds (unit = seconds), so the avg's partial/final sums
    // are exact FP in any accumulation order; one rounding point at the
    // output.
    "q_ds_timediff_daily" -> ((s, d) =>
      dsOut(run(s, d, TsdbQuery(MatchAll, Start, End,
        timeDifference = Some(TimeDifferenceSpec("seconds")),
        downsample = Some(DownsampleSpec("1d", "avg")))), "gap_avg")),

    // The same node from JSON — shares q_ds_timediff's oracle.
    "q_json_timediff" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "timeDifference": {"unit": "minutes"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("ts"),
          round(col("value"), 6).as("tdiff"))
    },

    // Bucket-quantile node (upstream TSDB 3.x BucketQuantileConfig):
    // the input series are histogram BUCKET COUNTERS — per (user, day),
    // event values bin into fixed-bound buckets whose counts are stored
    // as one metric per bucket, bounds in the metric name (exactly the
    // shape the upstream node parses). p50/p95/p99 then come from the
    // cumulative counts: the first bucket reaching q×total reports its
    // upper bound. Integer counts end-to-end — no rounding discipline.
    "q_bucket_quantile" -> { (s, d) =>
      val counters = prepared(s, d)
        .withColumn("metric", bucketMetricExpr)
        .groupBy(col("metric"), col("tags")("user").as("tag_user"),
          (col("ts") - col("ts") % 86400).as("bucket_ts"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.SeriesAnalytics
        .bucketQuantile(counters, Seq("tag_user"), Seq(0.5, 0.95, 0.99))
        .select(col("tag_user"), col("bucket_ts"), col("quantile"),
          col("value").as("latency_bound"))
    },

    // The same quantiles from CUMULATIVE bucket counters (the upstream
    // config's other bucket shape — Prometheus-style "le" counters):
    // the harness converts the per-bucket counts to running totals
    // before the node, and the pick must be identical — the oracle is
    // shared verbatim with q_bucket_quantile.
    "q_bucket_quantile_cum" -> { (s, d) =>
      graft.operators.SeriesAnalytics
        .bucketQuantile(cumulativeCounters(s, d), Seq("tag_user"),
          Seq(0.5, 0.95, 0.99), cumulative = true)
        .select(col("tag_user"), col("bucket_ts"), col("quantile"),
          col("value").as("latency_bound"))
    },

    // The cumulative shape driven END-TO-END through run() from a
    // STORED-counter source: the source table already holds
    // Prometheus-style "le" counter series (monotone running counts,
    // daily reset — [[storedCumulativeCounters]]), and the parsed
    // pipeline downsamples each bucket series with `last` (reading the
    // stored running total, never recounting it), spatial-groups, and
    // picks inside run(). This is the stored-aggregate read path the
    // upstream node serves (GorillaDownSampledTimeSeriesEncoder.java:
    // 138-180); shares q_bucket_quantile's oracle verbatim.
    "q_bucket_quantile_cum_stored" -> { (s, d) =>
      val q = TsdbQuery(MatchAll, Start, End,
        downsample = Some(DownsampleSpec("1d", "last")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum")),
        bucketQuantile = Some(BucketQuantileSpec(Seq(0.5, 0.95, 0.99),
          cumulative = true)))
      QueryEngine.run(storedCumulativeCounters(s, d), q, assumeDeduped = true)
        .select(col("user").as("tag_user"), col("bucket_ts"), col("quantile"),
          col("value").as("latency_bound"))
    },

    // Olympic-scoring anomaly baseline (the egads OlympicModel hosted by
    // the upstream anomaly node family): each user-day count is compared
    // to the olympic mean (drop one high + one low, average the rest) of
    // its STRICTLY EARLIER same-day-of-week buckets over the full 30-day
    // range — weekly seasonality gives each position 4-5 samples, so the
    // trim branch is exercised. Counts are exact ints; baseline and
    // deviation snap to 4 decimals before the 0.5-threshold compare.
    "q_anomaly_olympic" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val ds = run(s, d, TsdbQuery(MatchAll, DataStart, fullEnd,
        downsample = Some(DownsampleSpec("1d", "count")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum"))))
        .withColumn("value", round(col("value"), 4))
      graft.operators.SeriesAnalytics.olympic(ds, Seq(col("user")),
        expr("(bucket_ts DIV 86400) % 7"))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("deviation"), col("anomaly"))
    },

    // MAD ROBUST ANOMALY (round 11 — the robust member of the anomaly
    // family beside causal zscore and olympic): per-user daily counts
    // scored against their weekday cohort's median, scaled by
    // 1.4826·MAD. Retrospective (whole-range cohort statistics) — the
    // backfill/audit detector shape; a masked outlier the inflated
    // stddev lets through is exactly what this flags (spec-pinned in
    // SeriesAnalyticsSpec).
    "q_anomaly_mad" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val ds = run(s, d, TsdbQuery(MatchAll, DataStart, fullEnd,
        downsample = Some(DownsampleSpec("1d", "count")),
        groupBy = Some(GroupBySpec(Seq("user"), "sum"))))
        .withColumn("value", round(col("value"), 4))
      graft.operators.SeriesAnalytics.robustZscore(ds, Seq("user"),
        expr("(bucket_ts DIV 86400) % 7"))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("robust_z"), col("anomaly"))
    },

    // OLYMPIC × TIMEZONE (round 11 — the second half of the tz
    // composition gap): Denver local-day counts with weekly seasonal
    // indexing on the LOCAL clock. The full run() pipeline — tz
    // downsample → group-by → olympic node with the local seasonal
    // position (label + offset-at-label recovers the local day number).
    // January is one MST segment, so the oracle restates the constant
    // −25200 arithmetic in both the bucket and the position; regrouped
    // buckets AND a shifted seasonal slot each fail the hash.
    "q_anomaly_olympic_tz" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val json = s"""{
        "start": $DataStart, "end": $fullEnd,
        "downsample": {"interval": "1d", "aggregator": "count",
                       "timezone": "America/Denver"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "anomaly": {"model": "olympic", "period": 7}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("deviation"), col("anomaly"))
    },

    // The anomaly node family from client JSON documents — each twin
    // shares its direct query's oracle verbatim, so parser or node-order
    // divergence surfaces as a hash mismatch.
    "q_json_anomaly" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "anomaly": {"model": "zscore", "threshold": 3.0}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("zscore"), col("anomaly"))
    },

    "q_json_anomaly_olympic" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val json = s"""{
        "start": $DataStart, "end": $fullEnd,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "anomaly": {"model": "olympic", "period": 7}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("deviation"), col("anomaly"))
    },

    // the MAD model through the parsed pipeline: the engine's clock-
    // aware seasonal position for UTC/1d is (bucket_ts DIV 86400) % 7 —
    // exactly the direct query's expression, so the oracle is shared
    "q_json_anomaly_mad" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val json = s"""{
        "start": $DataStart, "end": $fullEnd,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "anomaly": {"model": "mad", "period": 7}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("robust_z"), col("anomaly"))
    },

    // MAD × TIMEZONE through the parsed pipeline: Denver local-day
    // buckets with the weekly slot indexed on the LOCAL clock (the
    // engine's shared clock-aware position — January is one MST
    // segment, so the oracle restates the constant −25200 arithmetic
    // in both the bucket and the slot). Regrouped buckets AND a
    // shifted seasonal slot each fail the hash.
    "q_anomaly_mad_tz" -> { (s, d) =>
      val fullEnd = DataStart + 31L * 86400
      val json = s"""{
        "start": $DataStart, "end": $fullEnd,
        "downsample": {"interval": "1d", "aggregator": "count",
                       "timezone": "America/Denver"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "anomaly": {"model": "mad", "period": 7}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          col("value").as("cnt"), col("baseline"), col("robust_z"), col("anomaly"))
    },

    // Multi-source expression graph from ONE client JSON document (the
    // upstream semantic-query shape): two named subqueries (error and
    // click per-user daily sums) joined by the expression node "e / c".
    // Each subquery's value snaps to 4 decimals at the subquery
    // boundary — the single rounding point the oracle restates.
    "q_json_expr" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "queries": [
          {"id": "e",
           "filter": {"type": "MetricLiteral", "metric": "error"},
           "downsample": {"interval": "1d", "aggregator": "sum"},
           "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}},
          {"id": "c",
           "filter": {"type": "MetricLiteral", "metric": "click"},
           "downsample": {"interval": "1d", "aggregator": "sum"},
           "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}}
        ],
        "expression": "e / c"
      }"""
      QueryEngine.runExpressionGraph(pts(s, d), TsdbJson.parseExpressionGraph(json))
        .select(col("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("err_per_click"))
    },

    // Dense fill through the JSON front end (downsample config's
    // FillPolicy): same grid as q_ds_dense, same oracle verbatim.
    "q_json_dense_fill" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum"},
        "fill": {"policy": "nan"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          when(isnan(col("value")), lit(null).cast("double"))
            .otherwise(round(col("value"), 4)).as("sum_value"))
    },

    // Real-value fill through the JSON front end: the `real` key on the
    // fill config selects the FillWithRealPolicy axis — same pipeline as
    // q_ds_fill_prefer, same oracle verbatim.
    "q_json_fill_real" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum"},
        "fill": {"policy": "null", "real": "prefer_previous"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // Summarizer through the JSON front end — same plan as q_summarizer,
    // same oracle verbatim.
    "q_json_summarizer" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "summarizer": {"summaries": ["avg", "max", "count", "last"]}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("avg_value"), col("max_value"),
          col("n_buckets"), col("last_value"))
    },

    // Percentile summaries through the JSON front end: the pNN summary
    // vocabulary resolves from the same registry as the direct query —
    // shares q_summarizer_pct's oracle verbatim.
    "q_json_summarizer_pct" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "sum"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "summarizer": {"summaries": ["p95", "p50", "count"]}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("user").as("tag_user"), col("p95_value"), col("p50_value"),
          col("n_buckets"))
    },

    // TimeDifference COMPOSED with downsample through the JSON front end
    // (the parser fills both slots from one document; run() orders them
    // node-before-downsample) — shares q_ds_timediff_daily's oracle.
    "q_json_timediff_daily" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "timeDifference": {"unit": "seconds"},
        "downsample": {"interval": "1d", "aggregator": "avg"}
      }"""
      run(s, d, TsdbJson.parseQuery(json))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("gap_avg"))
    },

    // Bucket-quantile through the JSON front end, running the FULL
    // parsed pipeline (downsample count → metric-keyed spatial group-by
    // → quantile node inside run()). The harness synthesizes the
    // bucket-counter SERIES the upstream node reads from storage
    // (metric = bucket name, series identity re-derived), exactly as
    // the direct query does; everything downstream of that synthesis is
    // the engine driven by the parsed document. Shares
    // q_bucket_quantile's oracle verbatim.
    "q_json_bucket_quantile" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "count"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "bucketQuantile": {"quantiles": [0.5, 0.95, 0.99]}
      }"""
      val counters = prepared(s, d)
        .withColumn("metric", bucketMetricExpr)
        .withColumn("series_id",
          graft.core.SeriesId.seriesId(col("metric"), col("tags")))
      QueryEngine.run(counters, TsdbJson.parseQuery(json), assumeDeduped = true)
        .select(col("user").as("tag_user"), col("bucket_ts"), col("quantile"),
          col("value").as("latency_bound"))
    },

    // The cumulative-counter shape via the JSON front end, running the
    // FULL parsed pipeline (upgraded in round 10 from a parser-only pin):
    // the source is the STORED "le" counter-series table
    // ([[storedCumulativeCounters]]), and the parsed document drives
    // downsample `last` (read the stored running total, never recount)
    // → metric-keyed spatial group-by → cumulative quantile pick, all
    // inside run() — the same end-to-end path as
    // q_bucket_quantile_cum_stored, with the config arriving as client
    // JSON. Shares q_bucket_quantile's oracle verbatim.
    "q_json_bucket_quantile_cum" -> { (s, d) =>
      val json = s"""{
        "start": $Start, "end": $End,
        "downsample": {"interval": "1d", "aggregator": "last"},
        "groupBy": {"tagKeys": ["user"], "aggregator": "sum"},
        "bucketQuantile": {"quantiles": [0.5, 0.95, 0.99], "cumulative": true}
      }"""
      QueryEngine.run(storedCumulativeCounters(s, d), TsdbJson.parseQuery(json),
          assumeDeduped = true)
        .select(col("user").as("tag_user"), col("bucket_ts"), col("quantile"),
          col("value").as("latency_bound"))
    }
  )

  // ------------------------------------------------------------- oracles

  private def dsOracle(aggSql: String, valueName: String,
      where: String = "", bucket: String = s"ts - ts % 86400"): String =
    s"""WITH $pointsCtes
       |SELECT metric, tag_user, $bucket AS bucket_ts, $aggSql AS $valueName
       |FROM dedup WHERE ${inRange()} $where
       |GROUP BY 1, 2, 3""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "q_ds_sum" -> dsOracle(rnd("sum(value)"), "sum_value"),

    // local = ts + offset; floor on the local clock; label back in epoch.
    // January 2024 is one MST segment: offset = -25200 throughout.
    "q_ds_tz" -> dsOracle(rnd("sum(value)"), "sum_value",
      bucket = "(ts - 25200) - (ts - 25200) % 86400 + 25200"),

    // calendar months restate as literal-boundary CASEs (stated as their
    // civil datetimes): UTC Jan/Feb/Mar 1 2024 = 1704067200 / 1706745600
    // / 1709251200. Data stops Feb 1, so the ELSE (January) carries
    // every row — the label sits BELOW the query start by design.
    "q_ds_month" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       CASE WHEN ts >= 1709251200 THEN 1709251200
         |            WHEN ts >= 1706745600 THEN 1706745600
         |            ELSE 1704067200 END AS bucket_ts,
         |       ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ts >= $Start AND ts < $TzFillEnd
         |GROUP BY 1, 2, 3""".stripMargin,

    // Denver month starts at local midnight: Dec 1 2023 07:00Z =
    // 1701414000, then 1704092400 / 1706770800 / 1709276400 (Jan/Feb/
    // Mar 1 2024, MST −7)
    "q_ds_month_tz" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       CASE WHEN ts >= 1709276400 THEN 1709276400
         |            WHEN ts >= 1706770800 THEN 1706770800
         |            WHEN ts >= 1704092400 THEN 1704092400
         |            ELSE 1701414000 END AS bucket_ts,
         |       ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |GROUP BY 1, 2, 3""".stripMargin,

    // quarters anchor Jan/Apr/Jul/Oct: Q4 2023 starts Oct 1 00:00 MDT =
    // 1696140000 (−6h — DST), Q1 2024 at 1704092400
    "q_ds_quarter_tz" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       CASE WHEN ts >= 1704092400 THEN 1704092400
         |            ELSE 1696140000 END AS bucket_ts,
         |       ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |GROUP BY 1, 2, 3""".stripMargin,

    // Denver years: Jan 1 2023 00:00 MST = 1672556400, Jan 1 2024 =
    // 1704092400
    "q_ds_year_tz" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       CASE WHEN ts >= 1704092400 THEN 1704092400
         |            ELSE 1672556400 END AS bucket_ts,
         |       ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |GROUP BY 1, 2, 3""".stripMargin,

    // prefer_previous over the monthly grid: previous real value, else
    // next, else NULL — the q_ds_fill_tz window pattern on the
    // boundary-list grid
    "q_fill_month_prev_tz" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user,
         |         CASE WHEN ts >= 1709276400 THEN 1709276400
         |              WHEN ts >= 1706770800 THEN 1706770800
         |              WHEN ts >= 1704092400 THEN 1704092400
         |              ELSE 1701414000 END AS bucket_ts,
         |         ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |  GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest([1701414000, 1704092400, 1706770800, 1709276400]) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts)
         |SELECT metric, tag_user, bucket_ts, ${rnd(
             "COALESCE(v, last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
               "first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))")} AS sum_value
         |FROM grid""".stripMargin,

    // the calendar fill grid: the four Denver month boundaries in range
    // as a literal list, zero where no month aggregate exists
    "q_fill_month_tz" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user,
         |         CASE WHEN ts >= 1709276400 THEN 1709276400
         |              WHEN ts >= 1706770800 THEN 1706770800
         |              WHEN ts >= 1704092400 THEN 1704092400
         |              ELSE 1701414000 END AS bucket_ts,
         |         ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |  GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest([1701414000, 1704092400, 1706770800, 1709276400]) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts)
         |SELECT metric, tag_user, bucket_ts, COALESCE(v, 0.0) AS sum_value
         |FROM grid""".stripMargin,

    "q_ds_avg" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |       ${rnd(s"${rnd("sum(value)")} / CAST(count(value) AS DOUBLE)")} AS avg_value,
         |       CAST(count(value) AS DOUBLE) AS cnt
         |FROM dedup WHERE ${inRange()}
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_ds_minmax" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |       ${rnd("min(value)")} AS min_value,
         |       ${rnd("max(value)")} AS max_value
         |FROM dedup WHERE ${inRange()}
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_ds_last" -> dsOracle(rnd("arg_max(value, ts)"), "last_value"),

    "q_ds_first" -> dsOracle(rnd("arg_min(value, ts)"), "first_value"),

    "q_ds_dev" -> dsOracle(rnd("stddev_samp(value)"), "dev_value"),

    "q_ds_median" -> dsOracle(rnd("quantile_cont(value, 0.5)"), "median_value"),

    "q_ds_p90" -> dsOracle(rnd("quantile_cont(value, 0.9)"), "p90_value"),

    // both engines compute max/min over identical doubles, so the
    // subtraction is bit-identical before the shared rounding
    "q_ds_range_plugin" -> dsOracle(rnd("max(value) - min(value)"), "range_value"),

    // deterministic 1/4 systematic sample: md5prefix28(ts) ≡ 0 (mod 4);
    // buckets with no sampled row surface as NULL in both engines
    "q_ds_p95_sampled" -> dsOracle(
      rnd("quantile_cont(value, 0.95) FILTER (WHERE " +
        "('0x' || substr(md5(CAST(ts AS VARCHAR)), 1, 7))::BIGINT % 4 = 0)"),
      "p95_sampled"),

    // DDSketch quantiles: the sketch walk restated end to end — a
    // bucket index off by one, a walk-order divergence, or a rank
    // convention slip all fail the hash
    "q_dds_quantiles" ->
      s"""WITH $pointsCtes,
         |${ddsCtes(DdsAlpha)},
         |qs AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q),
         |sel AS (SELECT c.metric, qs.q, min_by(${ddsEst(DdsAlpha)}, cum) AS est
         |        FROM c JOIN n USING (metric) CROSS JOIN qs
         |        WHERE cum > floor(qs.q * (n.n - 1))
         |        GROUP BY 1, 2)
         |SELECT metric, q, ${rnd("est")} AS est_v FROM sel""".stripMargin,

    // the per-(metric, day) sketch walk: same bucketing, same walk,
    // partitioned by the dashboard grain
    "q_dds_daily" -> {
      val g = graft.operators.QuantileSketch.gamma(DdsAlpha)
      s"""WITH $pointsCtes,
         |vals AS (SELECT metric, ts - ts % 86400 AS bucket_ts, value AS v
         |         FROM points WHERE value IS NOT NULL AND isfinite(value)),
         |b AS (SELECT metric, bucket_ts,
         |        CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sgn,
         |        CASE WHEN v = 0 THEN 0
         |             ELSE CAST(ceil(ln(abs(v)) / ln($g)) AS BIGINT) END AS idx,
         |        count(*) AS cnt
         |      FROM vals GROUP BY 1, 2, 3, 4),
         |c AS (SELECT metric, bucket_ts, sgn, idx, cnt,
         |        sum(cnt) OVER (PARTITION BY metric, bucket_ts
         |                       ORDER BY sgn, sgn * idx) AS cum
         |      FROM b),
         |n AS (SELECT metric, bucket_ts, sum(cnt) AS n FROM b GROUP BY 1, 2),
         |sel AS (SELECT c.metric, c.bucket_ts, min_by(${ddsEst(DdsAlpha)}, cum) AS est
         |        FROM c JOIN n USING (metric, bucket_ts)
         |        WHERE cum > floor(0.99 * (n.n - 1))
         |        GROUP BY 1, 2)
         |SELECT metric, bucket_ts, ${rnd("est")} AS p99_est FROM sel""".stripMargin
    },

    // DDSketch estimator quality: exact interpolated p90 beside the
    // α = 5% sketch estimate, per metric
    "q_dds_eval" ->
      s"""WITH $pointsCtes,
         |${ddsCtes(0.05)},
         |qs AS (SELECT 0.9::DOUBLE AS q),
         |sel AS (SELECT c.metric, qs.q, min_by(${ddsEst(0.05)}, cum) AS est
         |        FROM c JOIN n USING (metric) CROSS JOIN qs
         |        WHERE cum > floor(qs.q * (n.n - 1))
         |        GROUP BY 1, 2),
         |exact AS (SELECT metric, ${rnd("quantile_cont(v, 0.9)")} AS exact_v
         |          FROM vals GROUP BY 1)
         |SELECT sel.metric, sel.q, exact.exact_v, ${rnd("est")} AS est_v
         |FROM sel JOIN exact USING (metric)""".stripMargin,

    "q_ds_runall" -> dsOracle(
      rnd(s"${rnd("sum(value)")} / CAST(count(value) AS DOUBLE)"), "avg_value",
      bucket = s"CAST($Start AS BIGINT)"),

    "q_ds_reporting_avg" -> dsOracle(rnd("sum(value) / 27.0"), "rep_avg"),

    "q_ds_avg_run" -> dsOracle(rnd("avg(value)"), "avg_value"),

    "q_ds_infectious_nan" ->
      s"""WITH points AS (
         |  SELECT event_type AS metric,
         |         CAST(user_id AS VARCHAR) AS tag_user,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         |         CASE WHEN event_id % 101 = 0 THEN 'NaN'::DOUBLE ELSE value END AS value,
         |         event_id AS seq
         |  FROM events),
         |dedup AS (
         |  SELECT * FROM points
         |  QUALIFY row_number() OVER (PARTITION BY metric, tag_user, ts ORDER BY seq DESC) = 1)
         |SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |       CASE WHEN bool_or(isnan(value)) THEN NULL
         |            ELSE ${rnd("sum(CASE WHEN isnan(value) THEN NULL ELSE value END)")} END AS sum_value
         |FROM dedup WHERE ${inRange()}
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_ds_dense" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts)
         |SELECT s.metric, s.tag_user, b.bucket_ts, a.v AS sum_value
         |FROM series s CROSS JOIN b
         |LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |               AND a.bucket_ts = b.bucket_ts""".stripMargin,

    "q_ds_dense_zero" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts)
         |SELECT s.metric, s.tag_user, b.bucket_ts,
         |       COALESCE(a.v, 0) AS sum_zero, COALESCE(a.v, -1.5) AS sum_scalar
         |FROM series s CROSS JOIN b
         |LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |               AND a.bucket_ts = b.bucket_ts""".stripMargin,

    "q_ds_fill_previous" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts)
         |SELECT metric, tag_user, bucket_ts,
         |  COALESCE(v, last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |    ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS sum_prev,
         |  COALESCE(v, first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |    ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)) AS sum_next
         |FROM grid""".stripMargin,

    "q_ds_fill_lerp" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts),
         |w AS (
         |  SELECT metric, tag_user, bucket_ts, v,
         |    last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |      ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         |    first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |      ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         |    last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
         |      OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
         |    first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
         |      OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts
         |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb
         |  FROM grid)
         |SELECT metric, tag_user, bucket_ts,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN ${rnd(
                   "pv + (nv - pv) * (CAST(bucket_ts - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))", 6)}
         |       ELSE NULL END AS sum_lerp
         |FROM w""".stripMargin,

    "q_ds_fill_prefer" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, sum(value) AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts)
         |SELECT metric, tag_user, bucket_ts, ${rnd(
             "COALESCE(v, last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
               "first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))")} AS sum_value
         |FROM grid""".stripMargin,

    // zone-aware fill grid, restated with literal offsets: the label
    // walk runs on the LOCAL clock (uniform 86400 steps) and each local
    // day maps back to epoch with the offset at its own local start —
    // +25200 (MST) until the local walk reaches the transition's local
    // landing point 1710039600 (= 2024-03-10 09:00 UTC − 6h), +21600
    // (MDT) after. All data is in the MST segment, so the agg bucket is
    // q_ds_tz's single-segment arithmetic; the grid is two-segment.
    "q_ds_fill_tz" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user,
         |         (ts - 25200) - (ts - 25200) % 86400 + 25200 AS bucket_ts,
         |         sum(value) AS v
         |  FROM dedup WHERE ts >= $Start AND ts < $TzFillEnd GROUP BY 1, 2, 3),
         |series AS (SELECT DISTINCT metric, tag_user FROM agg),
         |b AS (
         |  SELECT lb + CASE WHEN lb >= 1710039600 THEN 21600 ELSE 25200 END AS bucket_ts
         |  FROM (SELECT unnest(range(1704326400, 1710439200, 86400)) AS lb) t),
         |grid AS (
         |  SELECT s.metric, s.tag_user, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts)
         |SELECT metric, tag_user, bucket_ts, ${rnd(
             "COALESCE(v, last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
               "first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user " +
               "ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))")} AS sum_value
         |FROM grid""".stripMargin,

    // interpolated spatial aggregation: per-series lerp grid (edges
    // ZERO), then the cross-series sum — v rounds at 4 entering the
    // fill and interpolated cells at 6, replaying the Spark stages
    "q_groupby_lerp" ->
      s"""WITH $pointsCtes,
         |agg AS (
         |  SELECT metric, tag_user, tag_host, tag_colo,
         |         ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} GROUP BY 1, 2, 3, 4, 5),
         |series AS (SELECT DISTINCT metric, tag_user, tag_host, tag_colo FROM agg),
         |b AS (SELECT unnest(range($Start, $End, 86400)) AS bucket_ts),
         |grid AS (
         |  SELECT s.metric, s.tag_user, s.tag_host, s.tag_colo, b.bucket_ts, a.v
         |  FROM series s CROSS JOIN b
         |  LEFT JOIN agg a ON a.metric = s.metric AND a.tag_user = s.tag_user
         |                 AND a.bucket_ts = b.bucket_ts),
         |w AS (
         |  SELECT metric, tag_user, tag_host, tag_colo, bucket_ts, v,
         |    last_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |      ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         |    first_value(v IGNORE NULLS) OVER (PARTITION BY metric, tag_user
         |      ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         |    last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
         |      OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
         |    first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
         |      OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts
         |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb
         |  FROM grid),
         |f AS (
         |  SELECT tag_host, tag_colo, bucket_ts,
         |    CASE WHEN v IS NOT NULL THEN v
         |         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN ${rnd(
                     "pv + (nv - pv) * (CAST(bucket_ts - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))", 6)}
         |         ELSE 0.0 END AS fv
         |  FROM w)
         |SELECT tag_host, tag_colo, bucket_ts, ${rnd("sum(fv)")} AS value
         |FROM f GROUP BY 1, 2, 3""".stripMargin,

    "q_hot_cold_union" -> dsOracle(rnd("sum(value)"), "sum_value"),

    "q_dict_resolve" -> dsOracle(rnd("sum(value)"), "sum_value"),

    "q_groups_fact" ->
      s"""WITH $pointsCtes
         |SELECT tag_host, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ${inRange()} AND tag_colo = 'sjc'
         |GROUP BY 1, 2""".stripMargin,

    "q_rate" ->
      s"""WITH $pointsCtes,
         |laged AS (
         |  SELECT metric, tag_user, ts, value,
         |         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
         |  FROM dedup WHERE ${inRange()}
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts))
         |SELECT metric, tag_user, ts,
         |       ${rnd("(value - pv) / CAST(ts - pt AS DOUBLE)", 6)} AS rate
         |FROM laged WHERE pt IS NOT NULL""".stripMargin,

    "q_rate_delta" ->
      s"""WITH $pointsCtes,
         |laged AS (
         |  SELECT metric, tag_user, ts, value,
         |         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
         |  FROM dedup WHERE ${inRange()}
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts))
         |SELECT metric, tag_user, ts, ${rnd("value - pv", 6)} AS delta
         |FROM laged WHERE pt IS NOT NULL""".stripMargin,

    "q_rate_counter" ->
      s"""WITH $pointsCtes,
         |laged AS (
         |  SELECT metric, tag_user, ts, value,
         |         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
         |  FROM dedup WHERE ${inRange()}
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts))
         |SELECT metric, tag_user, ts,
         |       ${rnd("(value - pv) / CAST(ts - pt AS DOUBLE)", 6)} AS rate
         |FROM laged WHERE pt IS NOT NULL AND value >= pv""".stripMargin,

    "q_rate_counter_rollover" ->
      s"""WITH $pointsCtes,
         |laged AS (
         |  SELECT metric, tag_user, ts, value,
         |         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
         |  FROM dedup WHERE ${inRange()}
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts)),
         |rated AS (
         |  SELECT metric, tag_user, ts,
         |         CASE WHEN value < pv
         |              THEN (500.0 - pv + value) / CAST(ts - pt AS DOUBLE)
         |              ELSE (value - pv) / CAST(ts - pt AS DOUBLE) END AS r
         |  FROM laged WHERE pt IS NOT NULL)
         |SELECT metric, tag_user, ts,
         |       ${rnd("CASE WHEN r > 0.001 THEN 0.0 ELSE r END", 6)} AS rate
         |FROM rated""".stripMargin,

    "q_rate_to_count" ->
      s"""WITH $pointsCtes,
         |rng AS (SELECT * FROM dedup WHERE ${inRange()}),
         |laged AS (
         |  SELECT metric, tag_user, ts, value,
         |         lag(ts) OVER w AS pt
         |  FROM rng
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts)),
         |md AS (
         |  SELECT metric, tag_user, dt AS mode_dt FROM (
         |    SELECT metric, tag_user, ts - pt AS dt, count(*) AS n,
         |           row_number() OVER (PARTITION BY metric, tag_user
         |                              ORDER BY count(*) DESC, ts - pt ASC) AS rn
         |    FROM laged WHERE pt IS NOT NULL GROUP BY 1, 2, 3)
         |  WHERE rn = 1)
         |SELECT l.metric, l.tag_user, l.ts,
         |       ${rnd("l.value * least(CAST(l.ts - l.pt AS DOUBLE), CAST(m.mode_dt AS DOUBLE))", 6)} AS cnt_value
         |FROM laged l JOIN md m ON l.metric = m.metric AND l.tag_user = m.tag_user
         |WHERE l.pt IS NOT NULL""".stripMargin,

    "q_full_pipeline" ->
      s"""WITH $pointsCtes,
         |rng AS (
         |  SELECT metric, tag_user, tag_host, ts + 604800 AS ts, value
         |  FROM dedup
         |  WHERE ts >= ${Start - 604800} AND ts < ${End - 604800}
         |    AND metric IN ('click', 'purchase') AND tag_colo = 'sjc'),
         |rated AS (
         |  SELECT metric, tag_user, tag_host, ts,
         |         (value - lag(value) OVER w) / CAST(ts - lag(ts) OVER w AS DOUBLE) AS r
         |  FROM rng
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts)),
         |ds AS (
         |  SELECT metric, tag_user, tag_host, ts - ts % 86400 AS bucket_ts, avg(r) AS a
         |  FROM rated WHERE r IS NOT NULL
         |  GROUP BY 1, 2, 3, 4)
         |SELECT tag_host, bucket_ts, ${rnd("sum(a)")} AS value
         |FROM ds GROUP BY 1, 2""".stripMargin,

    // the monthly-composition restatement: identical stages with the
    // Denver boundary CASE over the SHIFTED timestamps
    "q_full_pipeline_month" ->
      s"""WITH $pointsCtes,
         |rng AS (
         |  SELECT metric, tag_user, tag_host, ts + 604800 AS ts, value
         |  FROM dedup
         |  WHERE ts >= ${DataStart - 604800} AND ts < ${TzFillEnd - 604800}
         |    AND metric IN ('click', 'purchase') AND tag_colo = 'sjc'),
         |rated AS (
         |  SELECT metric, tag_user, tag_host, ts,
         |         (value - lag(value) OVER w) / CAST(ts - lag(ts) OVER w AS DOUBLE) AS r
         |  FROM rng
         |  WINDOW w AS (PARTITION BY metric, tag_user ORDER BY ts)),
         |ds AS (
         |  SELECT metric, tag_user, tag_host,
         |         CASE WHEN ts >= 1709276400 THEN 1709276400
         |              WHEN ts >= 1706770800 THEN 1706770800
         |              WHEN ts >= 1704092400 THEN 1704092400
         |              ELSE 1701414000 END AS bucket_ts,
         |         avg(r) AS a
         |  FROM rated WHERE r IS NOT NULL
         |  GROUP BY 1, 2, 3, 4)
         |SELECT tag_host, bucket_ts, ${rnd("sum(a)")} AS value
         |FROM ds GROUP BY 1, 2""".stripMargin,

    "q_timeshift" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       (ts + 604800) - (ts + 604800) % 86400 AS bucket_ts,
         |       ${rnd("sum(value)")} AS sum_value
         |FROM dedup
         |WHERE ts >= ${Start - 604800} AND ts < ${End - 604800}
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_groupby" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_host, tag_colo,
         |         ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT tag_host, tag_colo, bucket_ts, ${rnd("sum(v)")} AS value
         |FROM ds GROUP BY 1, 2, 3""".stripMargin,

    // tz group-by: q_ds_tz's single-segment label arithmetic feeding
    // q_groupby's two-stage aggregation
    "q_groupby_tz" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_host, tag_colo,
         |         (ts - 25200) - (ts - 25200) % 86400 + 25200 AS bucket_ts,
         |         ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT tag_host, tag_colo, bucket_ts, ${rnd("sum(v)")} AS value
         |FROM ds GROUP BY 1, 2, 3""".stripMargin,

    // calendar group-by: the monthly boundary CASE feeds the same
    // two-stage restatement
    "q_groupby_month_tz" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_host, tag_colo,
         |         CASE WHEN ts >= 1709276400 THEN 1709276400
         |              WHEN ts >= 1706770800 THEN 1706770800
         |              WHEN ts >= 1704092400 THEN 1704092400
         |              ELSE 1701414000 END AS bucket_ts,
         |         ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < $TzFillEnd
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT tag_host, tag_colo, bucket_ts, ${rnd("sum(v)")} AS value
         |FROM ds GROUP BY 1, 2, 3""".stripMargin,

    // absent-tag series join no group: WHERE tag_env IS NOT NULL
    "q_groupby_sparse" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_env,
         |         ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3, 4)
         |SELECT tag_env, bucket_ts, ${rnd("sum(v)")} AS value
         |FROM ds WHERE tag_env IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "q_groupby_p95" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_host,
         |         ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3, 4)
         |SELECT tag_host, bucket_ts, ${rnd("quantile_cont(v, 0.95)")} AS p95_value
         |FROM ds GROUP BY 1, 2""".stripMargin,

    "q_groupby_all" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT bucket_ts, ${rnd("max(v)")} AS value
         |FROM ds GROUP BY 1""".stripMargin,

    "q_latest" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, tag_host, tag_colo,
         |       ts AS last_ts, ${rnd("value")} AS last_value
         |FROM points
         |QUALIFY row_number() OVER (PARTITION BY metric, tag_user
         |                           ORDER BY ts DESC, seq DESC) = 1""".stripMargin,

    "q_stale_series" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, last_ts, last_value FROM (
         |  SELECT metric, tag_user, ts AS last_ts, ${rnd("value")} AS last_value
         |  FROM points WHERE ${inRange()}
         |  QUALIFY row_number() OVER (PARTITION BY metric, tag_user
         |                             ORDER BY ts DESC, seq DESC) = 1)
         |WHERE last_ts < ${End - 3 * 86400}""".stripMargin,

    "q_filter_literal" -> dsOracle("CAST(count(value) AS DOUBLE)", "cnt",
      where = "AND metric IN ('click', 'error') AND tag_user IN ('1', '2', '3')"),

    "q_filter_semijoin" -> dsOracle("CAST(count(value) AS DOUBLE)", "cnt",
      where = "AND metric IN ('click', 'error') AND tag_user IN ('1', '2', '3')"),

    "q_filter_regex" -> dsOracle(rnd("sum(value)"), "sum_value",
      where = "AND regexp_matches(metric, '^(cl|pu)') AND regexp_matches(tag_host, 'web0[01]')"),

    "q_filter_wildcard" -> dsOracle(rnd("sum(value)"), "sum_value",
      where = "AND regexp_matches(tag_host, 'web.*') AND tag_colo = 'sjc'",
      bucket = s"CAST($Start AS BIGINT)"),

    "q_filter_chain_not" -> dsOracle("CAST(count(value) AS DOUBLE)", "cnt",
      where = "AND (tag_user IN ('1','2','3','4','5') OR regexp_matches(tag_host, 'web02')) " +
        "AND NOT tag_colo = 'den'",
      bucket = s"CAST($Start AS BIGINT)"),

    "q_filter_tagkey_any" -> dsOracle(rnd("sum(value)"), "sum_value",
      where = "AND (regexp_matches(tag_user, 'sjc') OR regexp_matches(tag_host, 'sjc') " +
        "OR regexp_matches(tag_colo, 'sjc'))",
      bucket = s"CAST($Start AS BIGINT)"),

    // explicit-tags: the filter references 3 tag keys, so the 4-tag series
    // (those carrying the env tag) must be excluded
    "q_filter_explicit" -> dsOracle("CAST(count(value) AS DOUBLE)", "cnt",
      where = "AND tag_user IN ('0','1','2','3','4','5','6','7') AND tag_env IS NULL",
      bucket = s"CAST($Start AS BIGINT)"),

    "q_ds_sliding_avg" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT metric, tag_user, bucket_ts,
         |       ${rnd("avg(v) OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts " +
             "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS mov_avg
         |FROM ds""".stripMargin,

    "q_ds_sliding_p90" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT metric, tag_user, bucket_ts,
         |       ${rnd("quantile_cont(v, 0.9) OVER (PARTITION BY metric, tag_user " +
             "ORDER BY bucket_ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)")} AS mov_p90
         |FROM ds""".stripMargin,

    "q_ds_sliding_max" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, sum(value) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT metric, tag_user, bucket_ts,
         |       ${rnd("max(v) OVER (PARTITION BY metric, tag_user ORDER BY bucket_ts " +
             "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS mov_max
         |FROM ds""".stripMargin,

    "q_topn_series" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         ${rnd("sum(value)")} AS sum_value
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3),
         |tot AS (
         |  SELECT metric, tag_user, ${rnd("sum(sum_value)")} AS series_total
         |  FROM ds GROUP BY 1, 2),
         |top AS (
         |  SELECT * FROM tot
         |  QUALIFY row_number() OVER (ORDER BY series_total DESC, metric ASC, tag_user ASC) <= 5)
         |SELECT d.metric, d.tag_user, d.bucket_ts, d.sum_value, t.series_total
         |FROM ds d JOIN top t USING (metric, tag_user)""".stripMargin,

    "q_expr_ratio" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} AND metric IN ('error', 'click')
         |  GROUP BY 1, 2, 3),
         |g AS (
         |  SELECT metric, tag_user, bucket_ts, ${rnd("sum(v)")} AS v
         |  FROM ds GROUP BY 1, 2, 3)
         |SELECT e.tag_user, e.bucket_ts, ${rnd("e.v / c.v")} AS ratio
         |FROM (SELECT * FROM g WHERE metric = 'error') e
         |JOIN (SELECT * FROM g WHERE metric = 'click') c USING (tag_user, bucket_ts)
         |WHERE c.v <> 0""".stripMargin,

    "q_json_sliding_topn" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, tag_host, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()} AND tag_colo = 'sjc'
         |  GROUP BY 1, 2, 3, 4),
         |g AS (SELECT tag_host, bucket_ts, sum(v) AS v FROM ds GROUP BY 1, 2),
         |sl AS (
         |  SELECT tag_host, bucket_ts,
         |         avg(v) OVER (PARTITION BY tag_host ORDER BY bucket_ts
         |                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mv
         |  FROM g),
         |tot AS (SELECT tag_host, ${rnd("sum(mv)")} AS series_total FROM sl GROUP BY 1),
         |top AS (SELECT * FROM tot
         |        QUALIFY row_number() OVER (ORDER BY series_total DESC, tag_host ASC) <= 2)
         |SELECT s.tag_host, s.bucket_ts, ${rnd("s.mv")} AS mov_avg, t.series_total
         |FROM sl s JOIN top t USING (tag_host)""".stripMargin,

    // ranking stat is max over integer-exact daily counts; row_number
    // ties break on tag_user ASC in both engines (the topN rankOrd)
    "q_json_topn_max" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3),
         |g AS (SELECT tag_user, bucket_ts, sum(v) AS v FROM ds GROUP BY 1, 2),
         |tot AS (SELECT tag_user, round(max(v), 4) AS series_total FROM g GROUP BY 1),
         |top AS (SELECT * FROM tot
         |        QUALIFY row_number() OVER (ORDER BY series_total DESC, tag_user ASC) <= 5)
         |SELECT g.tag_user, g.bucket_ts, round(g.v, 4) AS cnt, t.series_total
         |FROM g JOIN top t USING (tag_user)""".stripMargin,

    "q_anomaly_zscore" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2),
         |z AS (
         |  SELECT tag_user, bucket_ts, v,
         |         ${rnd("avg(v) OVER win")} AS m,
         |         ${rnd("stddev_samp(v) OVER win")} AS sd,
         |         count(v) OVER win AS n
         |  FROM ds
         |  WINDOW win AS (PARTITION BY tag_user ORDER BY bucket_ts
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT tag_user, bucket_ts, v AS cnt,
         |       CASE WHEN n >= 3 AND sd > 0 THEN ${rnd("(v - m) / sd")} END AS zscore,
         |       COALESCE(abs(CASE WHEN n >= 3 AND sd > 0 THEN ${rnd("(v - m) / sd")} END) >= 3.0,
         |                false) AS anomaly
         |FROM z""".stripMargin,

    "q_summarizer" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts, sum(value) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2)
         |SELECT tag_user, ${rnd(rnd("sum(v)") + " / count(v)")} AS avg_value, ${rnd("max(v)")} AS max_value,
         |       count(v) AS n_buckets, ${rnd("max_by(v, bucket_ts)")} AS last_value
         |FROM ds GROUP BY 1""".stripMargin,

    "q_summarizer_pct" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts, sum(value) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2)
         |SELECT tag_user, ${rnd("quantile_cont(v, 0.95)")} AS p95_value,
         |       ${rnd("quantile_cont(v, 0.5)")} AS p50_value,
         |       count(v) AS n_buckets
         |FROM ds GROUP BY 1""".stripMargin,

    "q_expr_percent" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts, sum(value) AS v
         |  FROM dedup WHERE ${inRange()} AND metric = 'click'
         |  GROUP BY 1, 2),
         |tot AS (SELECT bucket_ts, ${rnd("sum(v)")} AS t FROM ds GROUP BY 1)
         |SELECT d.tag_user, d.bucket_ts, ${rnd("d.v * 100 / t.t")} AS pct
         |FROM ds d JOIN tot t USING (bucket_ts)
         |WHERE t.t <> 0""".stripMargin,

    // EWMA: the lag-chain is written in the same left-to-right order as
    // the engine's expression; dyadic weights keep every sum exact FP.
    "q_ds_ewma" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT metric, tag_user, bucket_ts,
         |       ${rnd("(v * 1.0 + COALESCE(lag(v, 1) OVER win * 0.5, 0) " +
             "+ COALESCE(lag(v, 2) OVER win * 0.25, 0) " +
             "+ COALESCE(lag(v, 3) OVER win * 0.125, 0)) / " +
             "(1.0 + (CASE WHEN lag(v, 1) OVER win IS NULL THEN 0 ELSE 0.5 END) " +
             "+ (CASE WHEN lag(v, 2) OVER win IS NULL THEN 0 ELSE 0.25 END) " +
             "+ (CASE WHEN lag(v, 3) OVER win IS NULL THEN 0 ELSE 0.125 END))")} AS ewma
         |FROM ds
         |WINDOW win AS (PARTITION BY metric, tag_user ORDER BY bucket_ts)""".stripMargin,

    // Simple MA: equal weights — integer counts sum exactly, one
    // terminal division over identical doubles.
    "q_ds_movavg_simple" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()}
         |  GROUP BY 1, 2, 3)
         |SELECT metric, tag_user, bucket_ts,
         |       ${rnd("(v + COALESCE(lag(v, 1) OVER win, 0) " +
             "+ COALESCE(lag(v, 2) OVER win, 0) " +
             "+ COALESCE(lag(v, 3) OVER win, 0)) / " +
             "(1.0 + (CASE WHEN lag(v, 1) OVER win IS NULL THEN 0 ELSE 1 END) " +
             "+ (CASE WHEN lag(v, 2) OVER win IS NULL THEN 0 ELSE 1 END) " +
             "+ (CASE WHEN lag(v, 3) OVER win IS NULL THEN 0 ELSE 1 END))")} AS mavg
         |FROM ds
         |WINDOW win AS (PARTITION BY metric, tag_user ORDER BY bucket_ts)""".stripMargin,

    // Time difference: integer-second gaps over one literal divisor.
    "q_ds_timediff" ->
      s"""WITH $pointsCtes,
         |laged AS (
         |  SELECT metric, tag_user, ts,
         |         lag(ts) OVER (PARTITION BY metric, tag_user ORDER BY ts) AS pt
         |  FROM dedup WHERE ${inRange()})
         |SELECT metric, tag_user, ts,
         |       ${rnd("CAST(ts - pt AS DOUBLE) / 60.0", 6)} AS tdiff
         |FROM laged WHERE pt IS NOT NULL""".stripMargin,

    // TimeDifference → daily avg: integer-second gaps sum exactly in
    // any order; the division is the single rounding point.
    "q_ds_timediff_daily" ->
      s"""WITH $pointsCtes,
         |g AS (
         |  SELECT metric, tag_user, ts,
         |         CAST(ts - lag(ts) OVER (PARTITION BY metric, tag_user ORDER BY ts)
         |              AS DOUBLE) AS v
         |  FROM dedup WHERE ${inRange()})
         |SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts,
         |       ${rnd("avg(v)")} AS gap_avg
         |FROM g WHERE v IS NOT NULL
         |GROUP BY 1, 2, 3""".stripMargin,

    // Bucket-quantile: integer counts end-to-end, so the cumulative pick
    // needs no rounding discipline at all.
    "q_bucket_quantile" ->
      s"""WITH $pointsCtes,
         |b AS (
         |  SELECT CASE WHEN value < 1 THEN 'lat_0_1'
         |              WHEN value < 5 THEN 'lat_1_5'
         |              WHEN value < 20 THEN 'lat_5_20'
         |              WHEN value < 50 THEN 'lat_20_50'
         |              WHEN value < 100 THEN 'lat_50_100'
         |              WHEN value < 250 THEN 'lat_100_250'
         |              ELSE 'lat_250_inf' END AS metric,
         |         tag_user, ts - ts % 86400 AS bucket_ts
         |  FROM dedup WHERE ${inRange()}),
         |c AS (SELECT metric, tag_user, bucket_ts, CAST(count(*) AS DOUBLE) AS v
         |      FROM b GROUP BY 1, 2, 3),
         |parsed AS (
         |  SELECT tag_user, bucket_ts, v,
         |         CAST(regexp_extract(metric, '_([0-9.]+)_([0-9.]+|inf)$$', 1) AS DOUBLE) AS lo,
         |         CASE WHEN regexp_extract(metric, '_([0-9.]+)_([0-9.]+|inf)$$', 2) = 'inf'
         |              THEN CAST(regexp_extract(metric, '_([0-9.]+)_([0-9.]+|inf)$$', 1) AS DOUBLE)
         |              ELSE CAST(regexp_extract(metric, '_([0-9.]+)_([0-9.]+|inf)$$', 2) AS DOUBLE)
         |         END AS rep
         |  FROM c),
         |cum AS (
         |  SELECT *,
         |         sum(v) OVER (PARTITION BY tag_user, bucket_ts ORDER BY lo
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
         |         sum(v) OVER (PARTITION BY tag_user, bucket_ts) AS tot
         |  FROM parsed)
         |SELECT tag_user, bucket_ts, quantile, min(rep) AS latency_bound
         |FROM cum CROSS JOIN (SELECT unnest(CAST([0.5, 0.95, 0.99] AS DOUBLE[])) AS quantile) AS qq
         |WHERE cm >= quantile * tot
         |GROUP BY 1, 2, 3""".stripMargin,

    // Expression graph: the subquery boundary is the ONE rounding point;
    // inside a subquery the downsample→groupBy sum reassociates freely
    // (same addends, one terminal round — the q_full_pipeline class).
    "q_json_expr" ->
      s"""WITH $pointsCtes,
         |e AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} AND metric = 'error'
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS v
         |  FROM dedup WHERE ${inRange()} AND metric = 'click'
         |  GROUP BY 1, 2)
         |SELECT e.tag_user, e.bucket_ts, ${rnd("e.v / c.v")} AS err_per_click
         |FROM e JOIN c USING (tag_user, bucket_ts)
         |WHERE c.v <> 0""".stripMargin,

    // Olympic scoring: window frame and arithmetic order mirror the
    // engine expression exactly; counts are exact ints until the one
    // division, which snaps to 4 decimals before the threshold compare.
    "q_anomaly_olympic" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < ${DataStart + 31L * 86400}
         |  GROUP BY 1, 2),
         |h AS (
         |  SELECT tag_user, bucket_ts, v,
         |         count(v) OVER win AS n, sum(v) OVER win AS s,
         |         min(v) OVER win AS mn, max(v) OVER win AS mx
         |  FROM (SELECT *, (bucket_ts // 86400) % 7 AS pos FROM ds)
         |  WINDOW win AS (PARTITION BY tag_user, pos ORDER BY bucket_ts
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |base AS (
         |  SELECT tag_user, bucket_ts, v,
         |         CASE WHEN n >= 4 THEN ${rnd("(s - mn - mx) / (n - 2)")}
         |              WHEN n >= 2 THEN ${rnd("s / n")} END AS baseline
         |  FROM h),
         |dev AS (
         |  SELECT tag_user, bucket_ts, v, baseline,
         |         CASE WHEN baseline > 0 THEN ${rnd("abs(v - baseline) / baseline")} END AS deviation
         |  FROM base)
         |SELECT tag_user, bucket_ts, v AS cnt, baseline, deviation,
         |       COALESCE(deviation >= 0.5, false) AS anomaly
         |FROM dev""".stripMargin,

    // MAD robust anomaly: exact interpolated median + MAD per weekday
    // cohort, 1.4826 consistency scale, 6-decimal snap before the
    // threshold compare — the identical two-pass in both engines
    "q_anomaly_mad" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user, ts - ts % 86400 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < ${DataStart + 31L * 86400}
         |  GROUP BY 1, 2),
         |slotted AS (SELECT *, (bucket_ts // 86400) % 7 AS slot FROM ds),
         |med AS (
         |  SELECT tag_user, slot, quantile_cont(v, 0.5) AS med
         |  FROM slotted GROUP BY 1, 2),
         |dev AS (
         |  SELECT s.tag_user, s.bucket_ts, s.slot, s.v, m.med,
         |         abs(s.v - m.med) AS adev
         |  FROM slotted s JOIN med m USING (tag_user, slot)),
         |mad AS (
         |  SELECT tag_user, slot, quantile_cont(adev, 0.5) AS mad
         |  FROM dev GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.tag_user, d.bucket_ts, d.v, ${rnd("d.med")} AS baseline,
         |         CASE WHEN a.mad > 0
         |              THEN ${rnd("(d.v - d.med) / (1.4826 * a.mad)", 6)} END AS robust_z
         |  FROM dev d JOIN mad a USING (tag_user, slot))
         |SELECT tag_user, bucket_ts, v AS cnt, baseline, robust_z,
         |       COALESCE(abs(robust_z) >= 3.0, false) AS anomaly
         |FROM scored""".stripMargin
  )

  // JSON front-end replays: selections are identical to the direct-ADT
  // queries above, so the oracles are shared verbatim — any divergence
  // between the JSON parser and the ADT shows up as a hash mismatch
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "q_json_chain_not" -> oraclesBase("q_filter_chain_not"),
    "q_json_ds_dev" -> oraclesBase("q_ds_dev"),
    "q_ds_auto" -> oraclesBase("q_ds_sum"),
    "q_sql_ds_sum" -> oraclesBase("q_ds_sum"),
    "q_sql_dds_quantiles" -> oraclesBase("q_dds_quantiles"),
    "q_sql_groupby" -> oraclesBase("q_groupby"),
    "q_sql_rate" -> oraclesBase("q_rate"),
    "q_sql_latest" -> oraclesBase("q_latest"),
    "q_ds_sum_hashdedup" -> oraclesBase("q_ds_sum"),
    "q_json_ds_auto" -> oraclesBase("q_ds_sum"),
    "q_json_ds_tz" -> oraclesBase("q_ds_tz"),
    "q_json_ds_month_tz" -> oraclesBase("q_ds_month_tz"),
    "q_json_ds_quarter_tz" -> oraclesBase("q_ds_quarter_tz"),
    "q_json_relative_time" -> oraclesBase("q_ds_sum"),
    "q_json_explicit" -> oraclesBase("q_filter_explicit"),
    "q_json_rate_counter" -> oraclesBase("q_rate_counter"),
    "q_json_groupby_p95" -> oraclesBase("q_groupby_p95"),
    "q_json_full" -> oraclesBase("q_full_pipeline"),
    "q_json_summarizer" -> oraclesBase("q_summarizer"),
    "q_json_dense_fill" -> oraclesBase("q_ds_dense"),
    "q_json_fill_real" -> oraclesBase("q_ds_fill_prefer"),
    "q_json_fill_tz" -> oraclesBase("q_ds_fill_tz"),
    "q_json_ewma" -> oraclesBase("q_ds_ewma"),
    "q_json_movavg_simple" -> oraclesBase("q_ds_movavg_simple"),
    "q_json_timediff" -> oraclesBase("q_ds_timediff"),
    "q_json_timediff_daily" -> oraclesBase("q_ds_timediff_daily"),
    "q_json_summarizer_pct" -> oraclesBase("q_summarizer_pct"),
    "q_bucket_quantile_cum" -> oraclesBase("q_bucket_quantile"),
    "q_bucket_quantile_cum_stored" -> oraclesBase("q_bucket_quantile"),
    "q_json_bucket_quantile" -> oraclesBase("q_bucket_quantile"),
    "q_json_bucket_quantile_cum" -> oraclesBase("q_bucket_quantile"),
    "q_json_anomaly" -> oraclesBase("q_anomaly_zscore"),
    "q_json_anomaly_olympic" -> oraclesBase("q_anomaly_olympic"),
    "q_json_anomaly_mad" -> oraclesBase("q_anomaly_mad"),

    // olympic over Denver local-day buckets: tz bucket arithmetic from
    // q_ds_tz + the LOCAL day number ((bucket_ts − 25200) // 86400) as
    // the weekly seasonal position; window/arithmetic mirror
    // q_anomaly_olympic exactly
    "q_anomaly_olympic_tz" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user,
         |         (ts - 25200) - (ts - 25200) % 86400 + 25200 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < ${DataStart + 31L * 86400}
         |  GROUP BY 1, 2),
         |h AS (
         |  SELECT tag_user, bucket_ts, v,
         |         count(v) OVER win AS n, sum(v) OVER win AS s,
         |         min(v) OVER win AS mn, max(v) OVER win AS mx
         |  FROM (SELECT *, ((bucket_ts - 25200) // 86400) % 7 AS pos FROM ds)
         |  WINDOW win AS (PARTITION BY tag_user, pos ORDER BY bucket_ts
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |base AS (
         |  SELECT tag_user, bucket_ts, v,
         |         CASE WHEN n >= 4 THEN ${rnd("(s - mn - mx) / (n - 2)")}
         |              WHEN n >= 2 THEN ${rnd("s / n")} END AS baseline
         |  FROM h),
         |dev AS (
         |  SELECT tag_user, bucket_ts, v, baseline,
         |         CASE WHEN baseline > 0 THEN ${rnd("abs(v - baseline) / baseline")} END AS deviation
         |  FROM base)
         |SELECT tag_user, bucket_ts, v AS cnt, baseline, deviation,
         |       COALESCE(deviation >= 0.5, false) AS anomaly
         |FROM dev""".stripMargin,

    // MAD over Denver local-day buckets: same −25200 bucket/slot
    // arithmetic as olympic_tz, same median/MAD two-pass as the UTC mad
    "q_anomaly_mad_tz" ->
      s"""WITH $pointsCtes,
         |ds AS (
         |  SELECT tag_user,
         |         (ts - 25200) - (ts - 25200) % 86400 + 25200 AS bucket_ts,
         |         CAST(count(value) AS DOUBLE) AS v
         |  FROM dedup WHERE ts >= $DataStart AND ts < ${DataStart + 31L * 86400}
         |  GROUP BY 1, 2),
         |slotted AS (
         |  SELECT *, ((bucket_ts - 25200) // 86400) % 7 AS slot FROM ds),
         |med AS (
         |  SELECT tag_user, slot, quantile_cont(v, 0.5) AS med
         |  FROM slotted GROUP BY 1, 2),
         |dev AS (
         |  SELECT s.tag_user, s.bucket_ts, s.slot, s.v, m.med,
         |         abs(s.v - m.med) AS adev
         |  FROM slotted s JOIN med m USING (tag_user, slot)),
         |mad AS (
         |  SELECT tag_user, slot, quantile_cont(adev, 0.5) AS mad
         |  FROM dev GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.tag_user, d.bucket_ts, d.v, ${rnd("d.med")} AS baseline,
         |         CASE WHEN a.mad > 0
         |              THEN ${rnd("(d.v - d.med) / (1.4826 * a.mad)", 6)} END AS robust_z
         |  FROM dev d JOIN mad a USING (tag_user, slot))
         |SELECT tag_user, bucket_ts, v AS cnt, baseline, robust_z,
         |       COALESCE(abs(robust_z) >= 3.0, false) AS anomaly
         |FROM scored""".stripMargin)
}
