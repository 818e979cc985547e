package graft.query

import graft.Fixtures
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P1: the scalar-aggregator registry — aliases, percentile family, and
 *  runtime-registered plugins flowing through the engine. */
class AggregatorsSpec extends AnyFunSuite {

  test("aliases resolve to their canonical aggregators") {
    for (a <- Seq("zimsum", "mimmin", "mimmax", "sum", "avg", "count", "last", "p95"))
      assert(Aggregators.isRegistered(a), a)
    assert(!Aggregators.isRegistered("nope"))
    assertThrows[IllegalArgumentException](Aggregators.resolve("nope"))
  }

  test("a runtime-registered plugin aggregator runs through downsample") {
    Aggregators.register("range", (v, _, _, _) => max(v) - min(v))
    val df = Fixtures.series("m", Map("h" -> "a"), (0L, 3.0), (10L, 9.0), (70L, 5.0))
    val out = QueryEngine.downsample(df, DownsampleSpec("1m", "range"), 0, 120)
      .select("bucket_ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(0L -> 6.0, 60L -> 0.0))
  }

  test("spatial group-by resolves the plugin family; 'last' is temporal-only") {
    // two series on one bucket: host=a values 1.0 and 3.0 → median 2.0
    val df = Fixtures.series("m", Map("h" -> "a"), (0L, 1.0)).unionByName(
      Fixtures.series("m2", Map("h" -> "a"), (0L, 3.0)))
    val ds = QueryEngine.downsample(df, DownsampleSpec("1m", "sum"), 0, 60)
    val med = QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("h"), "median"))
      .select("value").head.getDouble(0)
    assert(med === 2.0)
    assertThrows[IllegalArgumentException] {
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("h"), "last"))
    }
    assertThrows[IllegalArgumentException] {
      QueryEngine.groupBySpatial(ds, GroupBySpec(Seq("h"), "nope"))
    }
  }

  test("zimsum equals sum through the engine") {
    val df = Fixtures.series("m", Map("h" -> "a"), (0L, 1.0), (10L, 2.0))
    def run(agg: String) =
      QueryEngine.downsample(df, DownsampleSpec("1m", agg), 0, 60)
        .select("value").head.getDouble(0)
    assert(run("zimsum") === run("sum"))
  }
}
