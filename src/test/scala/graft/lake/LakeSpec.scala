package graft.lake

import graft.TestSpark
import graft.filters._
import graft.sources.TsdbViews
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-lake pruning + semi-join scan path plan assertions —
 *  the 100 TB behaviors: partition filters must reach the scan, the
 *  series_dim side must broadcast. */
class LakeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val lakeDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_lake").toString
    Lake.materialize(TestSpark.spark, sf, d)
    d
  }

  test("time predicates prune segment partitions at the scan") {
    val pts = Lake.points(TestSpark.spark, lakeDir)
    val seg = graft.core.TsdbSchema.SegmentSeconds
    val lo = 1704067200L + 10 * seg
    val filtered = pts.filter(col("segment_start") >= lo && col("segment_start") < lo + 2 * seg)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("segment_start"),
      s"partition filter must reach the parquet scan:\n$plan")
    // and the pruned read returns exactly the two windows
    val segs = filtered.select(col("segment_start").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(segs.forall(s => s >= lo && s < lo + 2 * seg))
  }

  test("semi-join scan path broadcasts the matched series set (J1)") {
    val spark = TestSpark.spark
    val pts = Lake.points(spark, lakeDir)
    val dim = TsdbViews.seriesDim(pts)
    val f = Chain.and(MetricLiteral(Seq("click")), TagLiteral("colo", Seq("sjc")))
    val scanned = Lake.semiJoinScan(pts, dim, f)
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast left-semi join:\n$plan")
    // equivalence with the direct predicate scan
    val direct = pts.filter(SeriesFilter.compile(f, col("metric"), col("tags")))
    assert(scanned.count() === direct.count())
    assert(scanned.count() > 0)
  }

  test("materialized lake round-trips the batch view") {
    val spark = TestSpark.spark
    val lake = Lake.points(spark, lakeDir).select("series_id", "ts", "seq").collect().toSet
    val direct = TsdbViews.points(spark, sf).select("series_id", "ts", "seq").collect().toSet
    assert(lake === direct)
  }
}
