package graft

import org.scalatest.funsuite.AnyFunSuite

/** The facade: source-agnostic query entry + spark.sql views. */
class GraftSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("registerViews exposes every table to plain SQL") {
    val spark = TestSpark.spark
    Graft.registerViews(spark, sf)
    val counts = Seq("graft_points", "graft_series_dim", "graft_events",
      "graft_documents", "graft_embeddings")
      .map(v => v -> spark.sql(s"SELECT count(*) FROM $v").head.getLong(0)).toMap
    assert(counts.values.forall(_ > 0), counts.toString)
    val agg = spark.sql(
      "SELECT metric, count(*) AS n FROM graft_points GROUP BY 1 ORDER BY 1")
    assert(agg.count() === 5)
  }

  test("Graft.query compiles a TsdbQuery against a resolved source") {
    import graft.filters._
    import graft.query._
    val spark = TestSpark.spark
    val src = graft.sources.Sources.resolve(s"events:$sf")
    val df = Graft.query(spark, src, TsdbQuery(
      MetricLiteral(Seq("click")), 1704067200L, 1706745600L,
      downsample = Some(DownsampleSpec("1d", "count"))))
    assert(df.count() > 0)
    assert(df.columns.toSet === Set("series_id", "metric", "tags", "bucket_ts", "value"))
  }
}
