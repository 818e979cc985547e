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

  /** Sequential-fold dot product of two equal-length double arrays —
   *  the native codegen expression [[graft.functions.DotProduct]];
   *  value-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (and
   *  to DuckDB's `list_dot_product`, which the oracles use), but the
   *  interpreted higher-order fold would sit in the innermost ANN loop. */
  def dot(a: Column, b: Column): Column = call_function("dotp", a, b)

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

  /** Embedding-cosine near-duplicate pairs: LSH-bucket candidates (never
   *  all-pairs) filtered to cosine ≥ threshold — the embedding-space
   *  analog of MinHash near-dup. */
  def cosineNearDuplicates(emb: DataFrame, threshold: Double): DataFrame = {
    val withBucket = emb.select(col("vec_id"),
      asDouble(col("embedding")).as("vec"),
      bucketId(asDouble(col("embedding"))).as("bucket"))
    val left = withBucket.select(col("vec_id").as("vec_a"), col("vec").as("va"), col("bucket"))
    val right = withBucket.select(col("vec_id").as("vec_b"), col("vec").as("vb"), col("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
   *  centroid once (broadcast centroids, one codegen pass), and a query
   *  searches only its own cell. Centroids here are a deterministic
   *  sample of the corpus (vec_id % centroidEvery == 0) — a production
   *  build would k-means them, the plan shape is identical. */
  def ivfAssign(emb: DataFrame, centroidEvery: Int): DataFrame = {
    val cents = emb.filter(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_vec"))
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("d").asc, col("c_id").asc)
    vecs.join(broadcast(cents), lit(true))
      // nearest by cosine distance; deterministic c_id tiebreak
      .withColumn("d", round(lit(1.0) - cosine(col("vec"), col("c_vec")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("vec"), col("c_id").as("cell"))
  }

  /** IVF top-k: candidates restricted to the query's cell. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, centroidEvery: Int): DataFrame = {
    val assigned = ivfAssign(emb, centroidEvery).persist()
    val queries = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("cell"))
    val sim = round(cosine(col("q_vec"), col("vec")), 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "sim")
  }

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
