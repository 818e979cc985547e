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

  test("hash-sampled percentile: plugin resolves through the registry and equals " +
      "the exact percentile over the deterministically-chosen subset") {
    import org.apache.spark.sql.functions._
    Aggregators.register("p50_sampled", (v, ts, _, _) =>
      percentile(when(pmod(call_function("md5prefix28", ts.cast("string")),
        lit(4)) === 0, v), lit(0.5)))
    val rows = (0L until 40L).map(t => (t, t.toDouble))
    val df = Fixtures.series("m", Map("h" -> "a"), rows: _*)
    val got = QueryEngine.downsample(df, DownsampleSpec("1m", "p50_sampled"), 0, 60)
      .select("value").head.getDouble(0)
    // replay the sample membership independently of the engine
    val sampled = rows.collect { case (t, v)
      if (graft.functions.Md5Prefix28.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t.toString)) % 4) == 0 => v }
      .sorted
    assert(sampled.nonEmpty && sampled.size < rows.size) // a real 1/4-ish subset
    val pos = 0.5 * (sampled.size - 1)
    val (lo, hi) = (sampled(pos.toInt), sampled(math.ceil(pos).toInt))
    val expect = lo + (hi - lo) * (pos - pos.toInt)
    assert(got === expect)
    // a bucket where NO row lands in the sample yields NULL, not a crash
    val tiny = Fixtures.series("m", Map("h" -> "a"),
      rows.filter { case (t, _) => (graft.functions.Md5Prefix28.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t.toString)) % 4) != 0 }: _*)
    val none = QueryEngine.downsample(tiny, DownsampleSpec("1m", "p50_sampled"), 0, 60)
      .select("value").head
    assert(none.isNullAt(0))
  }

  test("zimsum equals sum through the engine") {
    val df = Fixtures.series("m", Map("h" -> "a"), (0L, 1.0), (10L, 2.0))
    def run(agg: String) =
      QueryEngine.downsample(df, DownsampleSpec("1m", agg), 0, 60)
        .select("value").head.getDouble(0)
    assert(run("zimsum") === run("sum"))
  }
}
