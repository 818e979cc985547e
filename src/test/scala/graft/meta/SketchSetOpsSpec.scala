package graft.meta

import graft.TestSpark
import graft.filters.TagLiteral
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV set-algebra invariants: exactness below saturation, estimator
 *  sanity above it, and the ρ-scaled intersection arithmetic. */
class SketchSetOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A synthetic series dim: colo=den on even ids, env=prod on
   *  multiples of 5 — intersection = multiples of 10. */
  private def dim(n: Int) = (1 to n).map(i => ("m", i)).toDF("metric", "i")
    .withColumn("tags", map_filter(map(
      lit("user"), col("i").cast("string"),
      lit("colo"), when(col("i") % 2 === 0, "den").otherwise("sjc"),
      lit("env"), when(col("i") % 5 === 0, "prod")), (_, v) => v.isNotNull))
    .drop("i")

  private val fA = TagLiteral("colo", Seq("den"))
  private val fB = TagLiteral("env", Seq("prod"))
  private def ident = concat_ws("|", col("metric"), col("tags")("user"))

  test("below saturation the sketch IS the union: exact union, intersection, jaccard") {
    // ids 1..10: A = {2,4,6,8,10}, B = {5,10}, union 6, inter {10}
    val r = MetaQueries.sketchSetOps(dim(10), fA, fB, ident, k = 64).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(1) === 6L)        // sketch_n
    assert(row.getDouble(2) === 6.0)     // union_est — exact below k
    assert(row.getDouble(3) === 1.0)     // inter_est — exact below k
    assert(row.getDouble(4) === 0.1667)  // jaccard = round(1/6, 4)
  }

  test("saturated: bottom-k estimator lands near the true cardinalities") {
    // ids 1..500: union = 300 (250 even + 100 div-5 − 50 div-10), inter = 50
    val row = MetaQueries.sketchSetOps(dim(500), fA, fB, ident, k = 32).collect()(0)
    assert(row.getLong(1) === 32L, "saturated sketch holds exactly k rows")
    val (u, i, j) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    // k=32 KMV: stderr ~ 1/sqrt(k-2) ≈ 18%; generous 2.5σ bounds that a
    // broken estimator (exact-count fallback, wrong threshold rank,
    // un-scaled rho) still lands outside of
    assert(u > 150 && u < 450, s"union_est $u vs true 300")
    assert(i > 10 && i < 120, s"inter_est $i vs true 50")
    assert(j > 0.04 && j < 0.4, s"jaccard_est $j vs true 0.1667")
    // the rho arithmetic ties the three outputs together
    assert(math.abs(i - math.rint(j * u * 1e4) / 1e4) <= u * 2e-4 + 1e-6,
      "inter_est must equal jaccard * union (up to the two roundings)")
  }

  test("disjoint predicates: zero intersection and jaccard, union still estimated") {
    // A = even ids, B = env present only on odd multiples of 5
    val d = (1 to 100).map(i => ("m", i)).toDF("metric", "i")
      .withColumn("tags", map_filter(map(
        lit("user"), col("i").cast("string"),
        lit("colo"), when(col("i") % 2 === 0, "den").otherwise("sjc"),
        lit("env"), when(col("i") % 2 === 1 && col("i") % 5 === 0, "prod")),
        (_, v) => v.isNotNull))
      .drop("i")
    val row = MetaQueries.sketchSetOps(d, fA, fB, ident, k = 16).collect()(0)
    assert(row.getDouble(3) === 0.0 && row.getDouble(4) === 0.0)
    assert(row.getDouble(2) > 0.0)
  }
}
