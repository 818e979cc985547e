package graft.plans

import graft.TestSpark
import graft.rollup.Rollup
import graft.sources.TsdbViews
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Transparent SQL rollup routing: the [[RollupRouting]] optimizer rule
 *  must serve downsample-shaped aggregates over the marked facade view
 *  from the stored composite — bit-equal (post round-4) to the raw path —
 *  and fall back to raw, still correct, on every non-servable shape. */
class RollupRoutingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  /** View pair over NaN-injected points: `v_routed` carries the marker +
   *  a persisted rollup store; `v_raw` is the same LWW view unmarked. */
  private lazy val env: (DataFrame, DataFrame) = {
    val pts = TsdbViews.pointsWithNan(spark, sf)
    val storeDir = java.nio.file.Files.createTempDirectory("graft_route").toString
    Rollup.build(pts, "1h").write.mode("overwrite").parquet(s"$storeDir/rollup")
    val store = spark.read.parquet(s"$storeDir/rollup")
    RollupRouting.registerView(spark, pts, store, "1h", "v_routed")
    graft.query.QueryEngine.dedupeConfigured(pts).createOrReplaceTempView("v_raw")
    (pts, store)
  }
  private def setup: Unit = { env; () }

  private val Lo = 1704412800L // 2024-01-05, hour- and day-aligned
  private val Hi = 1705622400L // 2024-01-19

  private def sql(view: String, q: String): DataFrame =
    spark.sql(q.replace("$V", view))

  private def routed(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Window") // the LWW dedupe window is gone iff served
  }

  private def assertSame(q: String, expectRouted: Boolean): Unit = {
    setup
    val a = sql("v_routed", q)
    val b = sql("v_raw", q)
    assert(routed(a) === expectRouted, s"routing mismatch for:\n$q\n${a.queryExecution}")
    assert(!routed(b), "the unmarked view must never route")
    val (ra, rb) = (a.collect().map(_.toString).sorted.toSeq,
      b.collect().map(_.toString).sorted.toSeq)
    assert(ra === rb, s"value divergence for:\n$q")
    assert(ra.nonEmpty)
  }

  private val clean = "CASE WHEN isnan(value) THEN CAST(NULL AS DOUBLE) ELSE value END"

  test("daily sum over the marked view serves from the store") {
    assertSame(
      s"""SELECT metric, tags['user'] AS tag_user, ts - ts % 86400 AS bucket_ts,
         |       round(sum($clean), 4) AS sum_value
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi
         |GROUP BY 1, 2, 3""".stripMargin, expectRouted = true)
  }

  test("min/max/count/avg all rewrite to their stored forms") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS bucket_ts,
         |       round(min($clean), 4) AS mn, round(max($clean), 4) AS mx,
         |       count($clean) AS cnt, round(avg($clean), 4) AS av
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi
         |GROUP BY 1, 2""".stripMargin, expectRouted = true)
  }

  test("stddev_samp rewrites to the stored-moments reconstruction") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, round(stddev_samp($clean), 4) AS sd
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = true)
  }

  test("nanvl spelling of the clean value also serves") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum(nanvl(value, NULL)), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = true)
  }

  test("series-identity predicates carry over to the store scan") {
    assertSame(
      s"""SELECT tags['host'] AS h, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi AND metric = 'click'
         |  AND tags['colo'] = 'den'
         |GROUP BY 1, 2""".stripMargin, expectRouted = true)
  }

  test("a 90m bucket (not a multiple of 1h) falls back to raw") {
    assertSame(
      s"""SELECT metric, ts - ts % 5400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = false)
  }

  test("an unaligned range bound falls back to raw") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= ${Lo + 60} AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = false)
  }

  test("count(*) is a row count the composite cannot serve — raw") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, count(*) AS c
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = false)
  }

  test("plain sum(value) keeps NaN-poisoning semantics — raw") {
    // with NaN injected every 101st seq, a routed answer would differ:
    // equality against the raw view proves the rule refused the rewrite
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, sum(value) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = false)
  }

  test("a value predicate falls back to raw") {
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi AND value > 0 GROUP BY 1, 2""".stripMargin,
      expectRouted = false)
  }

  test("non-aggregate uses of the view strip the marker cleanly") {
    setup
    val rows = spark.sql(s"SELECT * FROM v_routed WHERE ts >= $Lo LIMIT 5").collect()
    assert(rows.length === 5)
  }

  test("two routed aggregates in one query get independent store scans") {
    setup
    val q =
      s"""SELECT metric, b, s FROM (
         |  SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |  FROM v_routed WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2
         |  UNION ALL
         |  SELECT metric, ts - ts % 43200 AS b, round(sum($clean), 4) AS s
         |  FROM v_routed WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2)""".stripMargin
    val a = spark.sql(q)
    assert(routed(a), a.queryExecution.executedPlan.toString)
    val b = sql("v_raw", q.replace("v_routed", "v_raw"))
    assert(a.collect().map(_.toString).sorted.toSeq ===
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("a maintained-store flush frontier splits serving hybrid") {
    val (pts, store) = env
    // frontier mid-DAY on an hour boundary: the split must floor to the
    // day-7 label, not serve the partial day
    val frontier = Lo + 7 * 86400 + 3600
    // the store genuinely ends at the frontier — a split that reads the
    // store past it, or raw below it, would lose or double-count rows
    val truncated = store.filter(
      org.apache.spark.sql.functions.col("bucket_ts") < frontier)
    RollupRouting.registerView(spark, pts, truncated, "1h", "v_frontier",
      rollupUntil = frontier)
    def q(hi: Long) = spark.sql(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM v_frontier WHERE ts >= $Lo AND ts < $hi GROUP BY 1, 2""".stripMargin)
    assert(routed(q(Lo + 7 * 86400)), "a range closed below the frontier must serve")
    // a straddling range splits: store scan for closed days UNION a raw
    // window tail — both shapes present in one plan
    val past = q(Hi)
    val plan = past.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("bucket_ts"),
      s"hybrid split missing a side:\n$plan")
    val rawSql =
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin
    assert(past.collect().map(_.toString).sorted.toSeq ===
      sql("v_raw", rawSql).collect().map(_.toString).sorted.toSeq)
    // an UNBOUNDED tail splits too (raw side [frontier, inf))
    val unbounded = spark.sql(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM v_frontier WHERE ts >= $Lo GROUP BY 1, 2""".stripMargin)
    val rawUnbounded = sql("v_raw",
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo GROUP BY 1, 2""".stripMargin)
    assert(unbounded.collect().map(_.toString).sorted.toSeq ===
      rawUnbounded.collect().map(_.toString).sorted.toSeq)
    // no bucket floor on the grouping key ⇒ groups would straddle the
    // split ⇒ whole query reads raw
    val noFloor = spark.sql(
      s"""SELECT metric, round(sum($clean), 4) AS s
         |FROM v_frontier WHERE ts >= $Lo AND ts < $Hi GROUP BY 1""".stripMargin)
    assert(!noFloor.queryExecution.executedPlan.toString.contains("bucket_ts"))
    assert(noFloor.collect().map(_.toString).sorted.toSeq ===
      sql("v_raw",
        s"""SELECT metric, round(sum($clean), 4) AS s
           |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1""".stripMargin)
        .collect().map(_.toString).sorted.toSeq)
  }

  test("cross-series (spatial) group-bys serve too — sums are associative") {
    // grouping by host collapses many series into one group; the store
    // rows still partition the same point set, so Σ(hourly sums) per
    // (host, day) equals the raw sum exactly
    assertSame(
      s"""SELECT tags['host'] AS h, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin,
      expectRouted = true)
  }

  test("SELECT DISTINCT on identity columns serves from the store") {
    // a store row exists iff a raw point exists for that (series, hour),
    // so identity-column distincts agree exactly
    assertSame(
      s"""SELECT DISTINCT metric, tags['colo'] AS colo
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi""".stripMargin,
      expectRouted = true)
  }

  test("a count() wrapper over a routed aggregate still serves") {
    // count(*) over the grouped subquery prunes `value` (and the sum)
    // out of the marker's child entirely — the rewrite must survive the
    // pruned shape and serve the groups-only aggregate from the store
    // (regression: the probe's .count() measurements silently fell back
    // raw before the lazy base-attr lookup)
    assertSame(
      s"""SELECT count(*) AS n FROM (
         |  SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |  FROM $$V WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2)""".stripMargin,
      expectRouted = true)
  }

  test("parent operators above a routed aggregate are untouched") {
    // HAVING becomes a Filter over an extra aggregate column, ORDER BY
    // and LIMIT reference the aggregate's output attrs — all must keep
    // resolving because the rewrite preserves every output exprId
    assertSame(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM $$V WHERE ts >= $Lo AND ts < $Hi
         |GROUP BY 1, 2
         |HAVING sum($clean) > 1
         |ORDER BY s DESC, b, metric LIMIT 10""".stripMargin, expectRouted = true)
  }

  test("the ratio dashboard row routes both metric slices") {
    val df = graft.SparkEntry.queries("q_sql_expr_ratio")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(routed(df), plan)
    assert(!plan.contains("events.parquet"), s"raw fact scan survived:\n$plan")
  }

  test("hybrid split survives a derived-table phrasing") {
    // the subquery's aliases inline during normalization, so the raw
    // branch's result expressions arrive NON-named (GetMapValue, the
    // floor arithmetic) — the split must re-alias them, not MatchError
    // (regression: the rule's contract is raw fallback, never failure)
    val (pts, store) = env
    val frontier = Lo + 7 * 86400 + 3600
    val truncated = store.filter(
      org.apache.spark.sql.functions.col("bucket_ts") < frontier)
    RollupRouting.registerView(spark, pts, truncated, "1h", "v_dtbl",
      rollupUntil = frontier)
    def q(view: String) = spark.sql(
      s"""SELECT u, d, round(sum(CASE WHEN isnan(v) THEN CAST(NULL AS DOUBLE)
         |                            ELSE v END), 4) AS s
         |FROM (SELECT tags['user'] AS u, ts - ts % 86400 AS d, ts, value AS v
         |      FROM $view)
         |WHERE ts >= $Lo AND ts < $Hi GROUP BY u, d""".stripMargin)
    val a = q("v_dtbl")
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("bucket_ts") && plan.contains("Window"),
      s"derived-table hybrid did not split:\n$plan")
    assert(a.collect().map(_.toString).sorted.toSeq ===
      q("v_raw").collect().map(_.toString).sorted.toSeq)
  }

  test("a non-leaf store plan used by two aggregates in one query is safe") {
    // the truncated store is a Filter plan, not a re-instantiable leaf —
    // two rewrites insert the SAME subtree (shared exprIds in sibling
    // branches, the self-union shape); results must still be exact
    val (pts, store) = env
    val truncated = store.filter(
      org.apache.spark.sql.functions.col("bucket_ts") < Hi)
    RollupRouting.registerView(spark, pts, truncated, "1h", "v_nonleaf")
    val q =
      s"""SELECT metric, b, s FROM (
         |  SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |  FROM v_nonleaf WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2
         |  UNION ALL
         |  SELECT metric, ts - ts % 43200 AS b, round(sum($clean), 4) AS s
         |  FROM v_nonleaf WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2)""".stripMargin
    val a = spark.sql(q)
    assert(routed(a), a.queryExecution.executedPlan.toString)
    val b = sql("v_raw", q.replace("v_nonleaf", "v_raw"))
    assert(a.collect().map(_.toString).sorted.toSeq ===
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("the registry rows route / fall back as declared") {
    val r = graft.SparkEntry.queries("q_sql_rollup_routed")(spark, sf)
    assert(routed(r), r.queryExecution.executedPlan.toString)
    val f = graft.SparkEntry.queries("q_sql_rollup_fallback")(spark, sf)
    assert(!routed(f), "90m must run raw over the marked view")
    val h = graft.SparkEntry.queries("q_sql_rollup_hybrid")(spark, sf)
    val hPlan = h.queryExecution.executedPlan.toString
    assert(hPlan.contains("Window") && hPlan.contains("bucket_ts"),
      s"registry hybrid row must carry both sides:\n$hPlan")
  }

  test("the served plan reads only the store columns it needs") {
    setup
    val df = spark.sql(
      s"""SELECT metric, ts - ts % 86400 AS b, round(sum($clean), 4) AS s
         |FROM v_routed WHERE ts >= $Lo AND ts < $Hi GROUP BY 1, 2""".stripMargin)
    assert(routed(df))
    val plan = df.queryExecution.executedPlan.toString
    // column pruning applies to the substituted scan: the store scan's
    // ReadSchema carries only metric + bucket_ts + sum, not the
    // 10-column composite, and the bucket_ts range is pushed down
    val scanLine = plan.split("\n").find(l => l.contains("ReadSchema") && l.contains("bucket_ts"))
    assert(scanLine.isDefined, s"no store scan in:\n$plan")
    assert(!scanLine.get.contains("sumsq") && !scanLine.get.contains("cnt"),
      s"unpruned store scan:\n${scanLine.get}")
    assert(scanLine.get.contains("PushedFilters: [IsNotNull(bucket_ts)") ||
      scanLine.get.contains("GreaterThanOrEqual(bucket_ts"),
      s"range not pushed to the store scan:\n${scanLine.get}")
  }
}
