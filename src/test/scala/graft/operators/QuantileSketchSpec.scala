package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch invariants: the relative-error guarantee at every decile,
 *  merge-equals-batch (the streamed-maintenance contract), the
 *  three-store sign handling, and the planner formulas. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic heavy-tailed sample: no Math.random — values are a
   *  fixed arithmetic scramble spanning four decades (0.37 .. ~3.7e3),
   *  the shape percentile sketches exist for. */
  private def heavyTail: Seq[Double] =
    (1 to 2000).map(i => 0.37 * math.exp(((i * 2654435761L) % 9973).toDouble / 9973.0 * 9.21))

  private def exactQuantile(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.floor(q * (s.length - 1)).toInt)
  }

  test("every decile estimate is within alpha relative error of the exact rank value") {
    val alpha = 0.02
    val df = heavyTail.toDF("v").withColumn("k", lit("m"))
    val qs = (1 to 9).map(_ / 10.0)
    val est = QuantileSketch
      .quantiles(QuantileSketch.sketch(df, col("k"), col("v"), alpha), qs, alpha)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    qs.foreach { q =>
      val exact = exactQuantile(heavyTail, q)
      val rel = math.abs(est(q) - exact) / exact
      // alpha + the 4-decimal output rounding's worth of slack
      assert(rel <= alpha + 1e-3, s"q=$q exact=$exact est=${est(q)} rel=$rel")
    }
  }

  test("merge of per-batch partials equals the one-shot sketch") {
    val (a, b) = heavyTail.splitAt(700)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), col("sgn").cast("int"), col("idx").cast("long"), col("cnt").cast("long"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val keyed = (d: Seq[Double]) => d.toDF("v").withColumn("k", lit("m"))
    val whole = rows(QuantileSketch.sketch(keyed(heavyTail), col("k"), col("v"), 0.02))
    val merged = rows(QuantileSketch.merge(
      QuantileSketch.sketch(keyed(a), col("k"), col("v"), 0.02)
        .unionAll(QuantileSketch.sketch(keyed(b), col("k"), col("v"), 0.02))))
    assert(merged === whole)
  }

  test("negative and zero values walk in value order across the three stores") {
    val df = Seq(-100.0, -10.0, -1.0, 0.0, 1.0, 10.0, 100.0).toDF("v")
      .withColumn("k", lit("m"))
    val alpha = 0.01
    val est = QuantileSketch
      .quantiles(QuantileSketch.sketch(df, col("k"), col("v"), alpha),
        Seq(0.0, 0.25, 0.5, 0.75, 0.99), alpha)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(est(0.0) < -99.0, s"q=0 must be the most negative bucket: ${est(0.0)}")
    assert(math.abs(est(0.25) + 10.0) <= 0.2,
      "rank floor(0.25*6)=1 is the second row of the walk: -10")
    assert(est(0.5) === 0.0, "median of the symmetric set is the exact zero bucket")
    assert(math.abs(est(0.75) - 1.0) <= 0.02,
      "rank floor(0.75*6)=4 is the fifth row of the walk: +1")
    assert(math.abs(est(0.99) - 10.0) <= 0.2,
      "rank floor(0.99*6)=5 is the sixth row of the walk: +10")
  }

  test("null and NaN values are skipped, not bucketed") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(4.0)).toDF("v")
      .withColumn("k", lit("m"))
    val total = QuantileSketch.sketch(df, col("k"), col("v"), 0.01)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === 2L)
  }

  test("bucket count stays summary-sized whatever the fact size") {
    val alpha = 0.02
    val g = QuantileSketch.gamma(alpha)
    val n = QuantileSketch.sketch(
      heavyTail.toDF("v").withColumn("k", lit("m")), col("k"), col("v"), alpha)
      .count()
    // four decades of value at gamma: <= ln(1e4)/ln(g) + slack
    val bound = math.ceil(math.log(1e4) / math.log(g)).toLong + 3
    assert(n <= bound, s"$n buckets for 2000 rows exceeds the $bound summary bound")
  }

  test("planner: gamma and the twelve-decade bucket budget follow the formulas") {
    val rows = QuantileSketch.plan(spark, Seq(0.01))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 1)
    val (a, g, b, bytes) = rows(0)
    assert(a === 0.01)
    assert(math.abs(g - math.rint((1.01 / 0.99) * 1e6) / 1e6) <= 1e-9)
    assert(b === math.ceil(math.log(1e12) / math.log(1.01 / 0.99)).toLong + 2)
    assert(bytes === b * 16)
  }
}
