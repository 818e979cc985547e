package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** P3/P4: source and sink factory surfaces. */
class SourcesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("source factories resolve by scheme and yield the same schema") {
    val spark = TestSpark.spark
    val ev = Sources.resolve(s"events:$sf")
    assert(ev.name === s"events:$sf")
    val pts = ev.points(spark)
    assert(pts.columns.toSet ===
      Set("metric", "tags", "ts", "value", "seq", "series_id", "segment_start"))
    assert(pts.count() > 0)
    assert(ev.seriesDim(spark).columns.contains("tag_count"))
    assertThrows[IllegalArgumentException](Sources.resolve("bogus:x"))
  }

  test("interchangeable sources answer the same query identically") {
    val spark = TestSpark.spark
    val lakeDir = java.nio.file.Files.createTempDirectory("graft_src").toString
    graft.lake.Lake.materialize(spark, sf, lakeDir)
    val a = Sources.resolve(s"events:$sf").points(spark)
    val b = Sources.resolve(s"lake:$lakeDir").points(spark)
    val q = (df: org.apache.spark.sql.DataFrame) =>
      graft.query.QueryEngine.downsample(df, graft.query.DownsampleSpec("1d", "sum"), 0, 4102444800L)
        // summation order differs between physical layouts: compare rounded
        .select(org.apache.spark.sql.functions.col("series_id"),
          org.apache.spark.sql.functions.col("bucket_ts"),
          org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("value"), 6))
        .collect().toSet
    assert(q(a) === q(b))
  }

  test("sink factories resolve and the noop sink materializes") {
    val spark = TestSpark.spark
    val pts = Sources.resolve(s"events:$sf").points(spark).limit(10)
    graft.sinks.Sinks.resolve("noop").append(pts)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    graft.sinks.Sinks.resolve(s"parquet:$dir/pts").append(pts)
    assert(spark.read.parquet(s"$dir/pts").count() === 10)
    assertThrows[IllegalArgumentException](graft.sinks.Sinks.resolve("nope:x"))
  }

  test("approx meta cardinalities track the exact ones") {
    val spark = TestSpark.spark
    val dim = graft.sources.TsdbViews.seriesDim(
      Sources.resolve(s"events:$sf").points(spark))
    val exact = graft.meta.MetaQueries.metrics(dim, graft.filters.MatchAll)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.meta.MetaQueries.metricsApprox(dim, graft.filters.MatchAll)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((m, c) <- exact)
      assert(math.abs(approx(m) - c).toDouble / c < 0.1, s"$m: $c vs ${approx(m)}")
  }
}
