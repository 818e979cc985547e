package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus selection — the composition a 100 TB
 * pretraining-data pipeline actually runs over the document store, built
 * entirely from the already-oracle-checked stages:
 *
 *  1. quality gate ([[TextAnalysis.quality]] `keep`),
 *  2. exact-duplicate collapse (keep the min doc_id per normalized
 *     content hash, [[Dedup.exact]]),
 *  3. near-duplicate collapse (keep the min doc_id per connected
 *     component of the MinHash-LSH pair graph,
 *     [[Dedup.duplicateClusters]] — pairwise near-dup is not transitive,
 *     so clustering, not pair deletion, decides survivors).
 *
 * Each stage is a broadcast-or-hash equi-join keyed by doc_id against a
 * table no bigger than the corpus (quality: 1 row/doc; exact: 1
 * row/doc; clusters: only docs appearing in near-dup pairs), so the
 * whole selection is a chain of co-partitionable joins — no stage is
 * quadratic and every filter is evaluable independently per doc batch.
 */
object Corpus {

  /** Surviving documents with their quality score. A doc survives iff
   *  its quality gate passes, it is its content group's canonical (min
   *  doc_id), and it is not a non-representative member of a near-dup
   *  cluster. */
  def select(docs: DataFrame, nearThreshold: Double): DataFrame = {
    val quality = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score"), col("keep"))
    val canonical = docs
      .select(col("doc_id"), md5(Dedup.normalized(col("text"))).as("__h"))
      .join(Dedup.exact(docs).select(col("content_hash").as("__h"), col("canonical_id")), "__h")
      .select(col("doc_id"), col("canonical_id"))
    val clusters = Dedup.duplicateClusters(Dedup.nearDuplicates(docs, nearThreshold))
    docs.select(col("doc_id"))
      .join(quality, "doc_id")
      .join(canonical, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("keep") &&
        col("canonical_id") === col("doc_id") &&
        (col("cluster_id").isNull || col("cluster_id") === col("doc_id")))
      .select(col("doc_id"), col("quality_score"))
  }
}
