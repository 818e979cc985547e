package graft

import graft.pipeline.{Dedup, HashConstants}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inner-plan evidence for the eagerly-materialized dedup queries
 *  (q_dedup_minhash_eval / q_dedup_ngram): their declared frames end in
 *  Iterate.truncate, so PlanDump only sees the post-checkpoint RDD scan —
 *  this tool dumps the PRE-checkpoint DAG instead.
 *
 *  Writes to plans/r16:
 *   - `<q>_inner_after.txt`: the lazy frame of the SHIPPED pipeline
 *     (Dedup.minhashEvalLazy / ngramJaccardLazy — shared production code).
 *   - `<q>_inner_before.txt`: the round-15 two-pass shape (separate
 *     groupBy(doc_id).count() pass + separate counts/sig joins),
 *     REPLICATED here for evidence only — byte-for-byte the structure the
 *     round-16 fused aggregate replaced.
 *
 *  Usage: sbt "runMain graft.DedupPlans [outDir]" (SPARK_GRAFT_SF_DIR as Bench).
 */
object DedupPlans {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args.headOption.getOrElse("plans/r16"))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder().appName("graft-dedup-plans").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def write(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      System.err.println(s"[dedupplans] wrote $name.txt")
    }

    // ---- after: the shipped fused-aggregate pipelines (lazy frames) ----
    val (pM, evalAfter) = Dedup.minhashEvalLazy(docs, 0.5)
    write("q_dedup_minhash_eval_inner_after", evalAfter)
    pM.foreach(_.unpersist())
    val (pN, ngramAfter) = Dedup.ngramJaccardLazy(docs, 0.3, Int.MaxValue)
    write("q_dedup_ngram_inner_after", ngramAfter)
    pN.foreach(_.unpersist())

    // ---- before: the round-15 two-pass shape, replicated for evidence ----
    def beforePair(threshold: Double): (DataFrame, DataFrame) = {
      val expl = Dedup.shingleRows(docs).persist()
      val sigs = Dedup.signaturesFromShingles(expl).persist()
      val counts = expl.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val cand = Dedup.candidatePairsFromSignatures(sigs, Int.MaxValue).persist()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val explCand = expl.join(candDocs, Seq("doc_id"), "left_semi")
      val inter = cand
        .join(explCand.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
        .join(explCand.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
      val eq = zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0))
      val pairs = cand
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("i"))
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .withColumn("est",
          aggregate(eq, lit(0), _ + _).cast("double") / lit(HashConstants.NumPerms.toDouble))
        .withColumn("exact",
          col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      val t = lit(threshold)
      val evalAgg = pairs.agg(
        coalesce(sum(when(col("est") >= t && col("exact") >= t, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("est") >= t && col("exact") < t, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("est") < t && col("exact") >= t, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(col("est") < t && col("exact") < t, 1L).otherwise(0L)), lit(0L)).as("tn"),
        round(avg(round(abs(col("est") - col("exact")), 4)), 4).as("mean_abs_err"))
      val ngramOut = cand
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("i"))
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("jaccard",
          col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
        .filter(col("jaccard") >= 0.3)
        .select("doc_a", "doc_b", "jaccard")
      (evalAgg, ngramOut)
    }
    val (evalBefore, ngramBefore) = beforePair(0.5)
    write("q_dedup_minhash_eval_inner_before", evalBefore)
    write("q_dedup_ngram_inner_before", ngramBefore)
    spark.stop()
  }
}
