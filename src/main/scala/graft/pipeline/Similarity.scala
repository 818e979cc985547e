package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - Brute-force cosine top-k: the correctness baseline. The query set
 *    is small and broadcast, so the plan is scan × broadcast-nested-loop
 *    with no shuffle of the big side; per-pair cost is one codegen'd
 *    fold over the vector. Still O(|queries|·|corpus|) — fine for a
 *    bounded query batch, not for all-pairs.
 *  - LSH-bucketed top-k: the 100 TB path. Vectors get a
 *    sign-bucket from [[HashConstants.Planes]]; candidates are
 *    bucket-mates only, so the join is an equi-join on bucket id
 *    (shuffle O(n), each bucket small). Recall is tunable via
 *    NumPlanes; the standard multi-probe/multi-table extensions drop in
 *    by unioning bucket ids.
 *
 * All arithmetic is double-precision with exact plane constants so the
 * DuckDB oracle replays it bit-for-bit (modulo final rounding).
 */
object Similarity {
  import HashConstants._

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k for a query subset against the corpus.
   *  Results ranked by 4-decimal-rounded similarity (vec_id tiebreak)
   *  for deterministic cross-engine ordering. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_vec"))
    val corpus = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val sim = round(cosine(col("q_vec"), col("vec")), 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "sim")
  }

  /** Sign-bucket id from the fixed hyperplanes: bit p set iff
   *  dot(plane_p, v) > 0. */
  def bucketId(vec: Column): Column =
    (0 until NumPlanes).map { p =>
      val planeLit = array(Planes(p).map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Vector → LSH bucket assignment. */
  def buckets(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      bucketId(asDouble(col("embedding"))).as("bucket"))

  /** ANN top-k: candidates restricted to the query's bucket. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val withBucket = emb.select(col("vec_id"),
      asDouble(col("embedding")).as("vec"),
      bucketId(asDouble(col("embedding"))).as("bucket"))
    val queries = withBucket.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("bucket"))
    val sim = round(cosine(col("q_vec"), col("vec")), 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    withBucket.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "sim")
  }
}
