package graft.queries

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LLM-training-data pipeline queries over the `documents` and
 * `embeddings` tables: dedup (exact / MinHash-LSH / SimHash / n-gram
 * Jaccard), text analysis (stats, quality, langid, fingerprints),
 * similarity search (brute-force + LSH-bucketed ANN), and multimodal
 * column handling.
 *
 * Every oracle below is *generated from the same constants*
 * ([[graft.pipeline.HashConstants]]) as the Spark operators, so DuckDB
 * replays the identical md5-based integer arithmetic.
 */
object PipelineQueries {
  import HashConstants._

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  /** One streamed document-pipeline lake per sf dir (scrub → quality
   *  gate → dedup-on-redacted-content through a real file-source
   *  streaming query — [[graft.streaming.DocIngest.runPipeline]]),
   *  shared by the declared stream query. */
  private val docLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private val annStreamLakes = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Streamed IVF index per source dir per JVM: embeddings arrive as a
   *  file stream and are centroid-assigned on ingest
   *  ([[graft.streaming.EmbedIngest]]) into a cell-partitioned index. */
  private def annAssignLake(s: SparkSession, d: String): String =
    annStreamLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_embstream")
      val srcDir = base.resolve("src")
      java.nio.file.Files.createDirectory(srcDir)
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("embeddings.parquet"),
        java.nio.file.Paths.get(s"$d/embeddings.parquet"))
      val out = s"$base/index"
      graft.streaming.EmbedIngest.run(s, srcDir.toString,
        Similarity.hashSampledCentroids(emb(s, d), IvfK), out, s"$base/ckpt")
      out
    })

  private def docPipelineLake(s: SparkSession, d: String): String =
    docLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_docstream")
      val srcDir = base.resolve("src")
      java.nio.file.Files.createDirectory(srcDir)
      // the file-stream source lists only top-level files: a single-file
      // table symlinks whole; a directory table (Spark-written corpora,
      // e.g. the scale probe's) symlinks its part files individually
      val tgt = java.nio.file.Paths.get(s"$d/documents.parquet")
      if (java.nio.file.Files.isDirectory(tgt)) {
        // close the DirectoryStream: each leaked stream pins a file
        // descriptor for the life of the suite/probe JVM
        val st = java.nio.file.Files.list(tgt)
        try {
          val it = st.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(".parquet"))
              java.nio.file.Files.createSymbolicLink(srcDir.resolve(p.getFileName), p)
          }
        } finally st.close()
      } else {
        java.nio.file.Files.createSymbolicLink(srcDir.resolve("documents.parquet"), tgt)
      }
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      graft.streaming.DocIngest.runPipeline(s, srcDir.toString,
        s"$base/lake", s"$base/ckpt", schema).awaitTermination()
      s"$base/lake"
    })

  /** One streamed ANN-SERVING lake per sf dir: the q_ann_ivf query set
   *  arrives as THREE micro-batches of retrieval requests (3 files ×
   *  maxFilesPerTrigger=1) answered against the prebuilt assigned index
   *  — per-query purity means the result must equal the batch IVF,
   *  whose oracle the declared query reuses verbatim. */
  private val annServeLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def annServeLake(s: SparkSession, d: String): String =
    annServeLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_annserve")
      emb(s, d).filter(annQueryPred)
        .select(col("vec_id").as("q_id"), col("embedding"))
        .repartition(3).write.parquet(s"$base/src")
      val cents = Similarity.hashSampledCentroids(emb(s, d), IvfK)
      val assigned = Similarity.ivfAssignWith(emb(s, d), cents)
      graft.streaming.EmbedIngest.runQueryServe(s, s"$base/src", assigned, cents,
        s"$base/out", s"$base/ckpt", k = 3, nprobe = 1, maxFilesPerTrigger = Some(1))
      s"$base/out"
    })

  /** One streamed NEAR-DUP-admission lake per sf dir: the doc_id%3==0
   *  slice streams in THREE micro-batches (3 source files ×
   *  maxFilesPerTrigger=1) against the doc_id%2==0 slice's precomputed
   *  band index — the q_dedup_near_incremental split, so the oracle
   *  reuses that query's MinHash replay. Multi-batch on purpose: the
   *  oracle is batch-agnostic, so any admission decision that depended
   *  on batch composition would hash-mismatch. */
  private val nearDedupLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def docNearDedupLake(s: SparkSession, d: String): String =
    nearDedupLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_docneardedup")
      val all = s.read.parquet(s"$d/documents.parquet")
      all.filter(col("doc_id") % 3 === 0).repartition(3)
        .write.parquet(s"$base/src")
      graft.streaming.DocIngest.runPipelineNearDedup(s, s"$base/src",
        s"$base/lake", s"$base/ckpt", s"$base/work", all.schema,
        all.filter(col("doc_id") % 2 === 0), 0.5,
        maxFilesPerTrigger = Some(1)).awaitTermination()
      s"$base/lake"
    })

  /** One ingest-MAINTAINED drift-counts log per sf dir: the corpus
   *  streams in multi-file micro-batches, each appending its partial
   *  (source, token) counts ([[graft.streaming.DocIngest.runTokenCounts]]);
   *  counts add, so the summed log equals the batch recount exactly —
   *  q_stream_drift shares q_text_drift's oracle verbatim. */
  private val driftLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def driftCountsLake(s: SparkSession, d: String): String =
    driftLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_driftcounts")
      val all = s.read.parquet(s"$d/documents.parquet")
      all.repartition(3).write.parquet(s"$base/src")
      graft.streaming.DocIngest.runTokenCounts(s, s"$base/src",
        s"$base/lake", s"$base/ckpt", all.schema,
        maxFilesPerTrigger = Some(1)).awaitTermination()
      s"$base/lake"
    })

  /** The drift count store rebuilt with IN-BAND compaction (round 12):
   *  four micro-batches with `compactEvery = 2`, so the fold runs inside
   *  the ingest itself ([[graft.streaming.DocIngest.runTokenCounts]]) —
   *  q_stream_drift_compacted reads it against the same q_text_drift
   *  oracle, pinning that mid-stream folds never lose or double-count
   *  a (source, token) cell. */
  private val driftCompactLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def driftCountsCompactedLake(s: SparkSession, d: String): String =
    driftCompactLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_driftcomp")
      val all = s.read.parquet(s"$d/documents.parquet")
      all.repartition(4).write.parquet(s"$base/src")
      graft.streaming.DocIngest.runTokenCounts(s, s"$base/src",
        s"$base/lake", s"$base/ckpt", all.schema,
        maxFilesPerTrigger = Some(1), compactEvery = Some(2)).awaitTermination()
      s"$base/lake"
    })

  /** One ingest-MAINTAINED pair-counts log per sf dir
   *  ([[graft.streaming.DocIngest.runPairCounts]]): unigram AND
   *  adjacent-pair partials per micro-batch; counts add, so the summed
   *  logs serve PMI exactly — q_stream_pmi shares q_text_pmi's oracle. */
  private val pairLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def pairCountsLake(s: SparkSession, d: String): String =
    pairLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_paircounts")
      val all = s.read.parquet(s"$d/documents.parquet")
      all.repartition(3).write.parquet(s"$base/src")
      graft.streaming.DocIngest.runPairCounts(s, s"$base/src",
        s"$base/lake", s"$base/ckpt", all.schema,
        maxFilesPerTrigger = Some(1)).awaitTermination()
      s"$base/lake"
    })

  /** The pair-counts lake COMPACTED (round 12): a copy of the 3-batch
   *  store with the closed batch partitions folded to one snapshot
   *  ([[graft.streaming.StoreCompaction.compactCounts]] — counts are
   *  sums, so fold-then-sum == sum); q_stream_pmi_compacted reads it
   *  against q_text_pmi's oracle verbatim, so a compaction that loses
   *  or double-counts one pair fails the hash. The copy keeps the
   *  uncompacted read (q_stream_pmi) exercised in the same gate run. */
  private val pairCompactLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def pairCountsCompactedLake(s: SparkSession, d: String): String =
    pairCompactLakes.getOrElseUpdate(d, {
      val src = pairCountsLake(s, d)
      val base = java.nio.file.Files.createTempDirectory("graft_paircomp").toString
      val conf = s.sessionState.newHadoopConf()
      graft.core.Fs.copyDir(conf, s"$src/uni", s"$base/uni")
      graft.core.Fs.copyDir(conf, s"$src/bg", s"$base/bg")
      graft.streaming.StoreCompaction.compactCounts(s, s"$base/uni", Seq("tk"))
      graft.streaming.StoreCompaction.compactCounts(s, s"$base/bg", Seq("w1", "w2"))
      base
    })

  /** One streamed DECONTAM lake per sf dir: the odd-doc_id half streams
   *  through scrub → gate → reference-bloom decontam → dedup
   *  ([[graft.streaming.DocIngest.runPipelineDecontam]]) against the
   *  even half's pipeline output as the prior snapshot. */
  private val decontamLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def docDecontamLake(s: SparkSession, d: String): String =
    decontamLakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_docdecon")
      val all = s.read.parquet(s"$d/documents.parquet")
      all.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$base/src")
      val reference = all.filter(col("doc_id") % 2 === 0)
        .withColumn("text", TextAnalysis.redactedText(col("text")))
        .filter(TextAnalysis.keepExpr(col("text")))
      // expectedItems sized to the reference slice (a 1<<20 default bloom
      // is ~1 MB serialized and bloats every task binary for nothing)
      graft.streaming.DocIngest.runPipelineDecontam(s, s"$base/src",
        s"$base/lake", s"$base/ckpt", all.schema, reference,
        expectedItems = 1 << 14).awaitTermination()
      s"$base/lake"
    })

  /** The production ANN constants the declared queries use: a
   *  CONSTANT-size centroid table / per-subspace codebook (corpus-size-
   *  independent — [[Similarity.hashSampledCentroids]] /
   *  [[Similarity.pqCodebooksK]]), and a BOUNDED query batch (the
   *  `vec_id < 1000` conjunct caps the batch at 40 queries whatever the
   *  corpus size — per-query cost is the contract, so the measured probe
   *  tracks data growth, not query-count growth). Round 5 measured the
   *  old k ∝ n shapes super-linear (q_ann_pq 38.7×, q_ann_ivf 3.6× at
   *  10× data); these are the scale-safe declared shapes. */
  private val IvfK = 64
  private val PqK = 32
  private def annQueryPred = col("vec_id") % 25 === 0 && col("vec_id") < 1000

  /** Force every memoized per-JVM harness build for `d` (streamed doc/
   *  embedding lakes) — see [[graft.queries.StreamQueries.warmBuilds]];
   *  [[graft.Bench]] runs these untimed so first-toucher rows measure
   *  the read, not the build. */
  def warmBuilds(s: SparkSession, d: String): Unit =
    warmBuildTasks(s, d).foreach(_._2())

  /** Independent named build tasks for [[graft.Bench]]'s parallel
   *  warm-up pool — see [[graft.queries.StreamQueries.warmBuildTasks]].
   *  The pair-counts compaction copies the pair lake, so the two stay
   *  one sequenced task. */
  def warmBuildTasks(s: SparkSession, d: String): Seq[(String, () => Unit)] = Seq(
    "pipe_pair+paircomp" -> (() => { pairCountsLake(s, d); pairCountsCompactedLake(s, d); () }),
    "pipe_driftcomp" -> (() => { driftCountsCompactedLake(s, d); () }),
    "pipe_ann_assign" -> (() => { annAssignLake(s, d); () }),
    "pipe_doc" -> (() => { docPipelineLake(s, d); () }),
    "pipe_ann_serve" -> (() => { annServeLake(s, d); () }),
    "pipe_neardedup" -> (() => { docNearDedupLake(s, d); () }),
    "pipe_drift" -> (() => { driftCountsLake(s, d); () }),
    "pipe_decontam" -> (() => { docDecontamLake(s, d); () }))

  val defs: Map[String, Q] = Map(
    // token-frequency heavy hitters via the count-min sketch (round 11
    // — the corpus-side use of graft.operators.CountMin): the Zipf
    // head without a vocabulary-sized exact aggregate. A deliberately
    // narrow 4×16 grid over this corpus' ~31-token vocabulary forces
    // real collisions, so the report's est_n column pins the estimator
    // (min over 4 cells, never below exact_n) against the oracle's
    // identical cell walk.
    "q_text_cms_tokens" -> { (s, d) =>
      val toks = docs(s, d)
        .select(explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("tk"))
      graft.operators.CountMin.report(toks, col("tk"), depth = 4, width = 16, k = 20)
        .select(col("key").as("token"), col("exact_n"), col("est_n"))
    },

    "q_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    // incremental (snapshot-over-snapshot) dedup: the doc_id%3 "new
    // crawl" anti-joined against the doc_id%2 "reference corpus" —
    // their overlap (ids ≡ 0 mod 6, plus any cross-id content clones)
    // models the pages the last crawl already had. Bloom-prefiltered:
    // the reference is scanned once map-side, never shuffled.
    "q_dedup_incremental" -> ((s, d) =>
      Dedup.dedupAgainstReference(
        docs(s, d).filter(col("doc_id") % 3 === 0),
        docs(s, d).filter(col("doc_id") % 2 === 0), 1 << 16)),
    "q_dedup_near" -> ((s, d) => Dedup.nearDuplicates(docs(s, d), 0.5)),
    // incremental near-dup: the doc_id%3 "new crawl" banded against the
    // doc_id%2 "reference index" — cross-set pairs only (the same-id
    // filter strips the split's artificial self-overlap)
    "q_dedup_near_incremental" -> ((s, d) =>
      Dedup.nearDuplicatesAgainstReference(
        docs(s, d).filter(col("doc_id") % 3 === 0),
        docs(s, d).filter(col("doc_id") % 2 === 0), 0.5)
        .filter(col("new_id") =!= col("ref_id"))),
    "q_dedup_ngram" -> ((s, d) => Dedup.ngramJaccard(docs(s, d), 0.3)),
    // estimator-quality report: MinHash estimate vs exact Jaccard over
    // the candidate set, one row of confusion counts + mean abs error
    "q_dedup_minhash_eval" -> ((s, d) => Dedup.minhashEval(docs(s, d), 0.5)),
    // the analytical companion: the S-curve the current banding config
    // enforces, P(candidate | s) = 1 - (1 - s^r)^b over a 0.05 grid,
    // plus the curve's 50% point — planner (should catch) next to
    // q_dedup_minhash_eval (did catch)
    "q_dedup_band_plan" -> ((s, _) => Dedup.bandingPlan(s)),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashBuckets(docs(s, d))),
    // SimHash near-dup within Hamming distance 3: block-collision
    // candidates (pigeonhole over 4 x 7-bit blocks) + popcount verify
    "q_dedup_simhash_near" -> ((s, d) => Dedup.simhashNearDuplicates(docs(s, d), 3)),
    // the warehouse-scale composition: block buckets capped at 40 docs
    // (degenerate clone buckets drop whole — no quadratic join exists in
    // the plan) ∪ exact-collision star edges (loss-free for exact clones
    // at O(n) cost) — the SimHash mirror of Similarity's capped edges
    "q_dedup_simhash_capped" -> ((s, d) =>
      Dedup.simhashNearDuplicatesCapped(docs(s, d), 3, maxBucketSize = 40)),
    // pairwise near-dup is not transitive: collapse pairs to components
    // (min-label propagation) so the pipeline keeps ONE doc per cluster
    "q_dedup_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(Dedup.nearDuplicates(docs(s, d), 0.5))),
    // the end-to-end corpus selection a pretraining pipeline runs:
    // quality gate ∧ exact-dup canonical ∧ near-dup cluster representative
    "q_pipeline_corpus" -> { (s, d) =>
      Corpus.select(docs(s, d), 0.5)
        .select(col("doc_id"), round(col("quality_score"), 4).as("quality_score"))
    },
    // as q_pipeline_corpus, but each near-dup cluster keeps its
    // HIGHEST-QUALITY member (round4 score, doc_id tie-break) instead
    // of the id-ordered root — collapsing duplicates keeps the best
    // copy of the page
    "q_pipeline_corpus_best" -> { (s, d) =>
      Corpus.selectBestPerCluster(docs(s, d), 0.5)
        .select(col("doc_id"), round(col("quality_score"), 4).as("quality_score"))
    },
    // reproducible hash split: sample membership is a pure function of
    // the key, so holdout ranges can never leak across reruns
    "q_pipeline_sample" -> ((s, d) =>
      Corpus.hashSample(docs(s, d), col("doc_id"), 250).select(col("doc_id"))),
    // domain re-weighting: per-language rates over the langid prediction
    "q_pipeline_sample_stratified" -> ((s, d) =>
      Corpus.stratifiedSample(docs(s, d), Map("en" -> 800, "de" -> 300), 100)
        .select(col("doc_id"), col("pred_lang"))),
    // tokenizer fertility per language: BPE-ish tokens per whitespace
    // word — the vocab-efficiency number per language
    "q_text_fertility" -> ((s, d) => TextAnalysis.fertility(docs(s, d))),
    // vocabulary coverage: per-doc OOV fraction against the corpus'
    // top-24 vocab (constant-size broadcast probe; 31 distinct tokens
    // in the corpus, so the tail is genuinely out-of-vocabulary)
    "q_text_oov" -> ((s, d) => TextAnalysis.oovRate(docs(s, d), 24)),
    // corpus drift: pairwise JSD between per-source unigram
    // distributions over the top-24 head + __other bucket
    "q_text_drift" -> ((s, d) => TextAnalysis.unigramDrift(docs(s, d), 24)),
    // the same drift served from INGEST-MAINTAINED counts: micro-batches
    // append partial (source, token) counts; counts add, so the summed
    // log equals the batch recount exactly — q_text_drift's oracle
    // verbatim, whatever the micro-batch split
    "q_stream_drift" -> { (s, d) =>
      val counts = s.read.parquet(driftCountsLake(s, d))
        .groupBy(col("source"), col("tk")).agg(sum(col("__c")).as("__c"))
      TextAnalysis.unigramDriftFromCounts(counts, 24)
    },
    // the same serve from a store whose folds ran IN-BAND during the
    // ingest (DocIngest compactEvery — round 12): still q_text_drift's
    // oracle verbatim
    "q_stream_drift_compacted" -> { (s, d) =>
      val counts = graft.streaming.StoreCompaction.read(s, driftCountsCompactedLake(s, d))
        .groupBy(col("source"), col("tk")).agg(sum(col("__c")).as("__c"))
      TextAnalysis.unigramDriftFromCounts(counts, 24)
    },
    // exact-proportion data mixing: the largest corpus whose domain
    // composition matches the 50/30/20 target shares exactly — the
    // scarcest domain relative to its share bounds the feasible total,
    // each domain contributes its hash-ranked quota
    "q_pipeline_mix" -> ((s, d) =>
      Corpus.mixToProportions(docs(s, d), "source",
        Map("src0" -> 500, "src1" -> 300, "src2" -> 200))),
    // sequence packing into 512-token context bins, hash-sharded so the
    // prefix-sum window parallelizes and shard sizes ignore the id space
    "q_pipeline_pack" -> ((s, d) =>
      Corpus.pack(docs(s, d), budgetTokens = 512, nShards = 8)),
    // the loader-facing boundary index: per packed sequence, the ordered
    // doc_id:offset list for cross-document attention masking
    "q_pipeline_pack_index" -> ((s, d) =>
      Corpus.packIndex(docs(s, d), budgetTokens = 512, nShards = 8)),
    // fixed-window chunking: docs split into 32-token training windows
    "q_pipeline_chunks" -> ((s, d) => Corpus.chunk(docs(s, d), 32)),
    // corpus "data card": doc/token counts at each selection gate
    "q_pipeline_report" -> ((s, d) => Corpus.report(docs(s, d), 0.5)),
    // budgeted domain mixing: best 25 docs per predicted language
    "q_pipeline_topk_domain" -> ((s, d) => Corpus.topKByDomain(docs(s, d), 25)),
    // token-budget selection: best docs (quality desc) until 20k tokens;
    // cumulative structure on the distinct-score histogram, never a
    // global per-doc ORDER BY
    "q_pipeline_budget" -> ((s, d) => Corpus.selectByTokenBudget(docs(s, d), 20000)),
    // per-domain mixing: each predicted language fills its own 5k-token
    // budget with its best docs (no domain starves another)
    "q_pipeline_budget_domain" -> ((s, d) =>
      Corpus.selectByTokenBudgetByDomain(docs(s, d), 5000)),
    // Weighted sampling without replacement (Efraimidis-Spirakis
    // exponential keys, hash-derandomized): 100 docs with probability
    // proportional to token count; a pure function of (doc_id, salt).
    "q_pipeline_sample_weighted" -> { (s, d) =>
      val dd = docs(s, d)
      val weighted = dd.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Corpus.weightedSample(weighted, col("doc_id"), col("n_tokens"), 100, salt = "w8")
    },
    // Gopher quality rule set (Rae et al. 2021): token-count, word-length,
    // symbol-ratio, stopword and repetition gates — every keep decision is
    // an exact-integer cross-multiplied compare, no FP in any rule.
    "q_pipeline_gopher" -> ((s, d) => TextAnalysis.gopherRules(docs(s, d))),
    // CCNet-style per-language perplexity terciles (Wenzek et al. 2020):
    // bigram-LM fluency buckets head/middle/tail WITHIN each predicted
    // language; the tail is the drop set. Boundary table broadcast; no
    // global per-doc sort.
    "q_pipeline_ccnet" -> ((s, d) => Corpus.perplexityBuckets(docs(s, d))),
    // DSIR importance-resampling selection (Xie et al. 2023): raw-pool
    // docs (source outside src0/src1) ranked by the summed hashed-unigram
    // log-likelihood ratio target-vs-raw; top 200 kept. Weights quantize
    // to integer 1e-4 units per BUCKET, so every doc score is an exact
    // integer sum — no FP accumulation order anywhere in the ranking.
    "q_pipeline_dsir" -> ((s, d) =>
      Corpus.dsirSelect(docs(s, d), col("source").isin("src0", "src1"), 200)),
    // seeded disjoint train/val/test split (80/10/10 by salted hash)
    "q_pipeline_split" -> ((s, d) =>
      Corpus.trainValTestSplit(docs(s, d), 800, 100, salt = "s1")),
    // seeded epoch shuffle as (shard, pos): no global sort anywhere
    "q_pipeline_shuffle" -> ((s, d) =>
      Corpus.shuffleShards(docs(s, d), 8, salt = "e0")),
    // tf-idf top-3 keywords per document
    "q_text_keywords" -> ((s, d) => TextAnalysis.keywords(docs(s, d), 3)),
    // eval-leak detection: train docs sharing ≥2 distinct trigram
    // shingles with the (doc_id % 97 == 0) holdout slice
    // incremental-crawl novelty: the odd half scored against the even
    // half's shingle set (the q_dedup_incremental split)
    "q_pipeline_novelty" -> { (s, d) =>
      val dd = docs(s, d)
      Corpus.novelty(dd.filter(col("doc_id") % 2 === 1),
        dd.filter(col("doc_id") % 2 === 0))
    },
    "q_pipeline_decontam" -> ((s, d) =>
      Corpus.decontaminate(docs(s, d), col("doc_id") % 97 === 0, minOverlap = 2)),
    // the removal half of decontamination: train docs with NO ≥2-shingle
    // overlap against the eval slice (anti-join on the detector output)
    "q_pipeline_decontam_clean" -> { (s, d) =>
      val dd = docs(s, d)
      val contaminated = Corpus.decontaminate(dd, col("doc_id") % 97 === 0, minOverlap = 2)
        .select(col("train_id").as("doc_id")).distinct()
      dd.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    },
    // embedding-space decontamination: train vectors whose cosine to any
    // eval-suite vector reaches 0.3, strongest leak reported — catches
    // paraphrase contamination the n-gram detector can't see. The eval
    // suite is the FIXED first-100 slice (a benchmark is constant-size
    // however big the corpus grows — the declared shape must keep the
    // broadcast side constant, the same discipline as constant-k ANN)
    "q_pipeline_decontam_semantic" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.semanticDecontaminate(
        e.filter(col("vec_id") >= 100),
        Similarity.evalVectors(e, col("vec_id") < 100), 0.3)
    },
    "q_text_stats" -> ((s, d) => TextAnalysis.stats(docs(s, d))),
    // Gopher-style repetition quality signals (all exact-integer ratios)
    "q_text_repetition" -> ((s, d) => TextAnalysis.repetition(docs(s, d))),
    // corpus-unigram LM score + doc entropy; FP sums → round(…, 4)
    "q_text_logprob" -> { (s, d) =>
      TextAnalysis.corpusLogProb(docs(s, d))
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 4).as("avg_logprob"),
          round(col("entropy"), 4).as("entropy"))
    },
    // bigram-LM fluency: mean ln P(w2|w1) under the corpus bigram MLE —
    // catches well-worded nonsense the unigram score can't. Declared
    // through the bounded head table (headVocab = 16 first words by
    // successor mass, maxSuccessors = 8 per head word — both cuts bite
    // on this testdata's ~31-token vocabulary): the stats side is ≤
    // 16×8 rows and BROADCASTS on any corpus, the maxPostings
    // precedent. cnt1 stays the full successor mass, so surviving
    // probabilities are the true MLE conditionals.
    "q_text_bigram_lm" -> { (s, d) =>
      TextAnalysis.bigramLogProb(docs(s, d), hotN = 1024,
          headVocab = 16, maxSuccessors = 8)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logprob2"), 4).as("avg_logprob2"))
    },
    // PMI collocations (round 11): top adjacent pairs by pointwise
    // mutual information over the head-restricted bigram event space —
    // the statistics the bigram LM scores under, surfaced directly
    // (collocation / multi-word-expression mining). headVocab covers
    // this testdata's whole vocabulary, so the restriction is
    // exercised structurally while every pair stays in-model;
    // minCount = 5 makes the cut discriminating.
    "q_text_pmi" -> ((s, d) =>
      TextAnalysis.pmi(docs(s, d), minCount = 5, k = 40, headVocab = 2048)),

    // the same collocations served from INGEST-MAINTAINED unigram +
    // pair counts: micro-batches append partials, counts add, and
    // restricting the summed type table equals restricting pairs
    // before counting — q_text_pmi's oracle verbatim, with no document
    // ever re-read
    "q_stream_pmi" -> { (s, d) =>
      val lake = pairCountsLake(s, d)
      TextAnalysis.pmiFromCounts(
        s.read.parquet(s"$lake/uni"), s.read.parquet(s"$lake/bg"),
        minCount = 5, k = 40, headVocab = 2048)
    },

    // the same serve from the COMPACTED pair-counts store (round 12):
    // closed batch partials folded to one snapshot partition, the open
    // batch left in place — still q_text_pmi's oracle verbatim
    "q_stream_pmi_compacted" -> { (s, d) =>
      val lake = pairCountsCompactedLake(s, d)
      TextAnalysis.pmiFromCounts(
        graft.streaming.StoreCompaction.read(s, s"$lake/uni"),
        graft.streaming.StoreCompaction.read(s, s"$lake/bg"),
        minCount = 5, k = 40, headVocab = 2048)
    },

    // Okapi BM25 retrieval: a BOUNDED query batch (every 211th document
    // under id 10550 — ≤ 50 queries at any corpus size, the annQPred
    // convention) retrieves its 5 best lexical matches. Declared
    // through impact-ordered posting truncation (maxPostings = 200):
    // each query term scores only its 200 highest-wTf postings, so the
    // scoring join is bounded at |terms| × 200 rows on ANY corpus —
    // without it, stopword-saturated corpora (this testdata's ~31-word
    // vocabulary included) degenerate to scoring every (query, doc)
    // pair. The oracle replays the same exact-arithmetic cut. Ranking
    // is on the rounded score with doc_id tiebreak, so the top-k
    // replays exactly.
    "q_text_bm25" -> { (s, d) =>
      val dd = docs(s, d)
      TextAnalysis.bm25TopK(dd,
        dd.filter(col("doc_id") % 211 === 0 && col("doc_id") < 10550)
          .select(col("doc_id").as("query_id"), col("text")), 5,
        maxPostings = 200)
    },
    "q_text_quality" -> ((s, d) => TextAnalysis.quality(docs(s, d))),
    "q_text_langid" -> ((s, d) => TextAnalysis.langid(docs(s, d))),
    "q_text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))),
    // format-level PII scrub: emails → IPs → digit runs, sequentially,
    // so counts and the redacted fingerprint are one well-defined rewrite
    "q_text_pii" -> ((s, d) => TextAnalysis.redactPii(docs(s, d))),
    // substring-level dedup (Lee et al. 2022 at 16-token granularity):
    // duplicated spans across docs that doc-level dedup can't see
    "q_dedup_spans" -> ((s, d) => Dedup.duplicateSpans(docs(s, d), 16, 8)),
    // streamed scrub→gate→dedup ingest; within-batch dedup winners are
    // arbitrary, so the query exposes only content-determined columns
    "q_stream_doc_pipeline" -> { (s, d) =>
      s.read.parquet(docPipelineLake(s, d))
        .select(col("content_hash"),
          length(Dedup.normalized(col("text"))).cast("long").as("n_chars_norm"))
    },
    // streamed IVF index: vectors centroid-assigned on ingest into a
    // cell-partitioned store; assignment is row-local against the fixed
    // constant-k table, so the streamed index hash-matches a batch
    // re-assignment exactly
    "q_stream_ann_assign" -> ((s, d) =>
      s.read.parquet(annAssignLake(s, d))
        .select(col("vec_id"), col("cell").cast("long").as("cell"), col("d"))),
    // streamed incremental-crawl ingest: the odd half arrives as a
    // stream and is decontaminated against the even half's pipeline
    // output (reference bloom + exact confirm) before dedup-on-ingest
    "q_stream_doc_decontam" -> { (s, d) =>
      s.read.parquet(docDecontamLake(s, d))
        .select(col("content_hash"),
          length(Dedup.normalized(col("text"))).cast("long").as("n_chars_norm"))
    },
    // streamed ANN query serving: retrieval requests answered per
    // micro-batch against the prebuilt IVF index — equals the batch
    // IVF (q_ann_ivf's oracle verbatim) whatever the request batching
    "q_stream_ann_query" -> ((s, d) =>
      s.read.parquet(annServeLake(s, d)).select("q_id", "rank", "vec_id", "sim")),
    // streamed near-dup ADMISSION: the crawl slice admitted by the
    // per-batch MinHash band join against the prior snapshot's stored
    // index — equals the batch nearDuplicatesAgainstReference
    // restatement whatever the micro-batch split
    "q_stream_near_admission" -> ((s, d) =>
      s.read.parquet(docNearDedupLake(s, d)).select(col("doc_id"))),
    // the removal half: drop every repeated 16-token block but its
    // canonical occurrence; fully duplicated docs vanish entirely
    "q_dedup_span_removal" -> ((s, d) => Corpus.removeDuplicateSpans(docs(s, d), 16)),
    // sliding-window chunking: 32-token windows every 16 tokens, so
    // consecutive training windows share 16 tokens of context
    "q_pipeline_chunks_strided" -> ((s, d) => Corpus.chunkStrided(docs(s, d), 32, 16)),
    // temperature mixing over the source domain (α = 0.5): rarest
    // source samples at 700‰, a 4×-larger one at 350‰
    "q_pipeline_sample_temperature" -> ((s, d) =>
      Corpus.temperatureSample(docs(s, d), "source", 700)),
    // CCNet-style head/middle/tail terciles on the quality histogram
    "q_pipeline_quality_buckets" -> ((s, d) =>
      Corpus.qualityBuckets(docs(s, d), 333, 333)),
    // quality-weighted epoch repetition: head tercile trains 3 epochs,
    // middle 2, tail 1 — one (doc_id, epoch) row per appearance
    "q_pipeline_epochs" -> ((s, d) =>
      Corpus.epochSchedule(docs(s, d), 333, 333, 3, 2, 1)),
    "q_ann_brute" -> ((s, d) =>
      Similarity.bruteForceTopK(emb(s, d), col("vec_id") % 50 === 0, 5)),
    // contrastive hard negatives: nearest neighbors whose label differs
    // from the query's — the near-miss training examples
    "q_ann_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(emb(s, d), col("vec_id") % 50 === 0, 5)),
    "q_ann_buckets" -> ((s, d) =>
      Similarity.buckets(emb(s, d)).groupBy("bucket").agg(count(lit(1)).as("n_vecs"))),
    "q_ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(emb(s, d), col("vec_id") % 25 === 0, 3)),
    // IVF over a CONSTANT-k hash-sampled centroid table: assignment is
    // n×64 (linear) however big the corpus grows
    "q_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopKWith(emb(s, d),
        Similarity.hashSampledCentroids(emb(s, d), IvfK), annQueryPred, 3)),
    // SemDeDup-style diversity cap: at most 5 members per semantic
    // cluster (nearest of 64 constant-k centroids — ~8/cell at sf0.01,
    // so the cap binds at every verify scale), survivors in
    // reproducible md5-hash order
    "q_ann_cluster_cap" -> ((s, d) =>
      Similarity.clusterCapSample(emb(s, d), IvfK, 5)),
    // residual IVF-PQ (the FAISS composition): codes quantize
    // v − centroid(cell) against a constant-k residual codebook
    "q_ann_ivfpq_residual" -> ((s, d) =>
      Similarity.ivfPqResidualTopK(emb(s, d),
        Similarity.hashSampledCentroids(emb(s, d), IvfK),
        annQueryPred, 3, m = 8, codebookK = PqK)),
    // multi-probe LSH: Hamming-radius-1 bucket union per query
    "q_ann_multiprobe" -> ((s, d) =>
      Similarity.lshTopK(emb(s, d), col("vec_id") % 25 === 0, 3, probeRadius = 1)),
    // IVF over Lloyd-refined constant-k centroids: per-round means round
    // to 4 decimals (like the assign distances), so the refinement
    // replays bit-for-bit in the oracle; recall is additionally checked
    // vs brute force in SimilaritySpec. Boundary caveat: the replay
    // rests on round(mean, 4) agreeing across engines — a per-(cell,dim)
    // mean landing within last-ulp FP noise of a .00005 boundary could
    // round apart and cascade through later Lloyd rounds. Not observed
    // at any tested scale; if it ever fires on a new corpus, coarsen the
    // snap (3 decimals) rather than chasing the sum order.
    "q_ann_kmeans" -> ((s, d) =>
      Similarity.ivfTopKWith(emb(s, d),
        Similarity.kmeansCentroidsFrom(emb(s, d),
          Similarity.hashSampledCentroids(emb(s, d), IvfK), iters = 2),
        annQueryPred, 3)),
    // multi-probe IVF: each query searches its 2 nearest cells (the IVF
    // analog of Hamming-1 multi-probe LSH)
    "q_ann_ivf_probe" -> ((s, d) =>
      Similarity.ivfTopKWith(emb(s, d),
        Similarity.hashSampledCentroids(emb(s, d), IvfK),
        annQueryPred, 3, nprobe = 2)),
    // recall@3 of the 2-probe IVF index vs the exact baseline — the
    // index-quality evaluation, per query and exact-integer
    "q_ann_recall" -> ((s, d) =>
      Similarity.recallAtK(emb(s, d),
        Similarity.hashSampledCentroids(emb(s, d), IvfK),
        annQueryPred, 3, nprobe = 2)),
    // truncation-recall ablation (round 11 — the Matryoshka-style
    // dimension sweep): recall@3 of brute-force search over the first
    // 8/16/32 of 64 dims vs the full-dim baseline, per (dim, query) —
    // the storage-savings measurement behind shipping shorter vectors
    "q_ann_trunc_recall" -> ((s, d) =>
      Similarity.truncatedRecallAtK(emb(s, d), annQueryPred, 3, Seq(8, 16, 32))),
    // mean-pooled class prototypes: one centroid per label
    "q_ann_label_centroids" -> ((s, d) =>
      Similarity.centroidsBy(emb(s, d), col("label"))),
    // embedding-space drift: pairwise cosine between label centroids —
    // the embedding companion to q_text_drift's unigram JSD
    "q_embed_drift" -> ((s, d) =>
      Similarity.centroidDrift(emb(s, d), col("label"))),
    // PQ compression: each vector → 8 subspace codes (nearest codeword
    // per subspace from the CONSTANT-32-codeword codebooks, packed-long
    // argmin — encode is n·m·32, linear)
    "q_ann_pq_codes" -> ((s, d) =>
      Similarity.pqEncodeWith(emb(s, d), m = 8,
        cb = Similarity.pqCodebooksK(emb(s, d), m = 8, k = PqK))),
    // PQ ADC search: per-query distance tables × compressed codes only
    "q_ann_pq" -> ((s, d) =>
      Similarity.pqTopKWith(emb(s, d),
        Similarity.pqCodebooksK(emb(s, d), m = 8, k = PqK), annQueryPred, 3, m = 8)),
    // two-stage retrieval: PQ/ADC candidates (kCand = 12) re-ranked by
    // exact cosine — compressed scan for the superset, exact repair on
    // a constant per-query candidate pool
    "q_ann_rerank" -> ((s, d) =>
      Similarity.rerankTopK(emb(s, d),
        Similarity.pqCodebooksK(emb(s, d), m = 8, k = PqK), annQueryPred,
        3, kCand = 12, m = 8)),
    // IVF-PQ: probe the query's coarse cell, ADC-scan only its codes
    "q_ann_ivfpq" -> ((s, d) =>
      Similarity.ivfPqTopKWith(emb(s, d),
        Similarity.hashSampledCentroids(emb(s, d), IvfK),
        Similarity.pqCodebooksK(emb(s, d), m = 8, k = PqK), annQueryPred, 3, m = 8)),
    // int8-style scalar quantization of a vector subset (corpus stats)
    "q_ann_quantize" -> ((s, d) =>
      Similarity.quantize(emb(s, d), col("vec_id") % 50 === 0)),
    "q_dedup_embed" -> ((s, d) =>
      Similarity.cosineNearDuplicates(emb(s, d), 0.3)),
    // exact-embedding dedup (1e-4 grid fingerprint) — the O(n) fallback
    // the near-dup bucket cap routes clone clusters through
    "q_dedup_embed_exact" -> ((s, d) => Similarity.exactDuplicates(emb(s, d))),
    // semantic dedup collapse: connected components over the embedding
    // near-dup pair graph (same propagation engine as q_dedup_clusters)
    "q_dedup_embed_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(
        Similarity.cosineNearDuplicates(emb(s, d), 0.3)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id").as("vec_id"), col("cluster_id"))),
    // hybrid dedup: a doc joins a cluster if EITHER the MinHash text
    // signal OR the embedding-cosine signal pairs it — the union of both
    // edge sets collapsed by one propagation (doc_id ≡ vec_id here)
    "q_dedup_hybrid_clusters" -> { (s, d) =>
      val textPairs = Dedup.nearDuplicates(docs(s, d), 0.5).select("doc_a", "doc_b")
      val embPairs = Similarity.cosineNearDuplicates(emb(s, d), 0.3)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.duplicateClusters(textPairs.unionByName(embPairs).distinct())
    },
    "q_mm_meta" -> ((s, d) => Multimodal.metaView(Multimodal.media(s, d))),
    "q_mm_resize" -> ((s, d) => Multimodal.resize(Multimodal.media(s, d), 32, 32)),
    "q_mm_frames" -> ((s, d) => Multimodal.frames(Multimodal.media(s, d))),
    "q_mm_features" -> ((s, d) => Multimodal.decodeFeatures(Multimodal.media(s, d)))
  )

  // ------------------------------------------------------------- oracles

  /** 28-bit md5-prefix base hash in DuckDB. */
  private def bh(e: String): String = s"('0x' || substr(md5($e), 1, 7))::BIGINT"

  private val toksCte: String =
    raw"toks AS (SELECT doc_id, lang, text, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents)"

  /** The PMI walk restated independently — shared by the direct query
   *  and its ingest-maintained-counts restatement. */
  private lazy val pmiOracle: String =
    s"""WITH $toksCte,
       |b AS (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM toks WHERE len(t) >= 2),
       |pairs AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM b),
       |cnts AS (SELECT unnest(t) AS tk FROM toks),
       |head AS (SELECT tk FROM (SELECT tk, count(*) AS cnt FROM cnts GROUP BY 1)
       |         ORDER BY cnt DESC, tk ASC LIMIT 2048),
       |r AS (SELECT w1, w2 FROM pairs
       |      WHERE w1 IN (SELECT tk FROM head) AND w2 IN (SELECT tk FROM head)),
       |bg AS (SELECT w1, w2, count(*) AS n_pair FROM r GROUP BY 1, 2),
       |m AS (SELECT w1, w2, n_pair,
       |        sum(n_pair) OVER (PARTITION BY w1) AS c1,
       |        sum(n_pair) OVER (PARTITION BY w2) AS c2,
       |        sum(n_pair) OVER () AS n_total
       |      FROM bg)
       |SELECT w1, w2, n_pair,
       |       ${OracleCommon.rnd("ln(CAST(n_pair AS DOUBLE) * n_total / (CAST(c1 AS DOUBLE) * c2))", 6)} AS pmi
       |FROM m WHERE n_pair >= 5
       |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 40""".stripMargin

  private val shCte: String =
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3)"

  private val hsCte: String =
    s"hs AS (SELECT doc_id, list_transform(s, x -> ${bh("x")}) AS h FROM sh)"

  private val sigList: String =
    (0 until NumPerms)
      .map(i => s"list_min(list_transform(h, v -> (v*${PermA(i)} + ${PermB(i)}) % $P))")
      .mkString("[", ", ", "]")

  private val bandKeyExpr: String =
    (1 to RowsPerBand).map(r => s"sig[$RowsPerBand*bi+$r]::VARCHAR").mkString(" || '_' || ")

  /** Shared MinHash CTE chain up to distinct candidate pairs. */
  private val candCtes: String =
    s"""$toksCte,
       |$shCte,
       |$hsCte,
       |sigs AS (SELECT doc_id, $sigList AS sig FROM hs),
       |bands AS (SELECT doc_id, bi, $bandKeyExpr AS key
       |          FROM sigs, range(0, $NumBands) AS r(bi)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.bi = b.bi AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  private def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Near-dup pairs → connected components (requires candCtes; the whole
   *  chain must sit under WITH RECURSIVE). `cl` = doc → min-id cluster. */
  private val clusterCtes: String =
    s"""np AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |           len(list_filter(range(1, ${NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) / $NumPerms.0 AS ej
       |    FROM cand
       |    JOIN sigs sa ON sa.doc_id = doc_a
       |    JOIN sigs sb ON sb.doc_id = doc_b)
       |  WHERE ej >= 0.5),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM np
       |          UNION ALL SELECT doc_b, doc_a FROM np),
       |reach AS (
       |  SELECT DISTINCT a AS doc, a AS r FROM edges
       |  UNION
       |  SELECT e.a AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.b),
       |cl AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc)""".stripMargin

  private val simhashExpr: String =
    (0 until 28).map { b =>
      s"CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")

  private val fpWindowExpr: String =
    FpWeights.zipWithIndex
      .map { case (w, j) => s"h[i+$j]*$w" }
      .mkString("(", " + ", s") % $P")

  private def langScore(markers: Seq[String]): String =
    s"len(list_filter(t, x -> list_contains(${sqlList(markers)}, x)))"

  private val langPred: String = {
    // mirrors TextAnalysis.langid's fold: a later language wins only if
    // strictly above the max of all earlier ones
    val scores = LangMarkers.map { case (l, m) => l -> langScore(m) }
    val cases = scores.zipWithIndex.drop(1).reverse.map { case ((l, s), i) =>
      val prevMax = scores.take(i).map(_._2) match {
        case Seq(one) => one
        case many => s"greatest(${many.mkString(", ")})"
      }
      s"WHEN $s > $prevMax THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${LangMarkers.head._1}' END"
  }

  private val langMax: String =
    s"greatest(${LangMarkers.map(m => langScore(m._2)).mkString(", ")})"

  private val stopList: String = sqlList(Stopwords)

  private def planeList(p: Int): String =
    Planes(p).map(v => f"$v%.3f").mkString("[", ", ", "]")

  private val bucketExpr: String =
    (0 until NumPlanes).map { p =>
      s"CASE WHEN list_dot_product(v, ${planeList(p)}) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  private def ndPlaneList(t: Int, p: Int): String =
    NdPlanes(t)(p).map(v => f"$v%.3f").mkString("[", ", ", "]")

  private def ndBucketExpr(t: Int): String =
    (0 until NdPlanesPerTable).map { p =>
      s"CASE WHEN list_dot_product(v, ${ndPlaneList(t, p)}) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  /** Multi-table near-dup bucketing: one row per (vec, table). Replays
   *  [[Similarity.ndBucketId]] over every [[NdTables]] table. */
  private val ndBucketsCte: String =
    "eb AS (" +
      (0 until NdTables).map { t =>
        s"SELECT vec_id, v, $t AS tbl, ${ndBucketExpr(t)} AS bucket FROM e"
      }.mkString("\n  UNION ALL ") + ")"

  /** Hash-ranked constant-k sample order — replays
   *  [[Similarity.hashSampledCentroids]]' (md5-prefix, vec_id) order. */
  private val hashOrd: String = bh("CAST(vec_id AS VARCHAR)")

  /** CONSTANT-64 centroid table (the production IVF shape). */
  private val cents64Cte: String =
    s"""c AS (SELECT vec_id AS c_id, v AS cv FROM
       |  (SELECT vec_id, v FROM e ORDER BY $hashOrd ASC, vec_id ASC LIMIT $IvfK))""".stripMargin

  /** CONSTANT-32-codeword-per-subspace PQ codebooks. */
  private val pqCb32Cte: String =
    s"""cb AS (SELECT vec_id AS c_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS cv
       |  FROM (SELECT vec_id, v FROM e ORDER BY $hashOrd ASC, vec_id ASC LIMIT $PqK),
       |       range(0, 8) AS r(sub))""".stripMargin

  /** The bounded ANN query batch (≤ 40 queries at any corpus size). */
  private val annQPred: String = "vec_id % 25 = 0 AND vec_id < 1000"

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  import OracleCommon.rnd

  /** One Lloyd assign step as a CTE: nearest centroid from `centsCte` by
   *  4-decimal-rounded cosine distance, c_id tiebreak — the SQL replay of
   *  [[Similarity]]'s packed-long argmin. */
  private def kmAssign(name: String, centsCte: String): String =
    s"""$name AS (
       |  SELECT vec_id, v, c_id AS cell FROM (
       |    SELECT e.vec_id, e.v, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
       |    FROM e, $centsCte c)
       |  WHERE rn = 1)""".stripMargin

  /** One Lloyd update step as a CTE: per-(cell, dim) mean ROUNDED to 4
   *  decimals (the snap that makes the refinement engine-replayable),
   *  reassembled in dim order. */
  private def kmUpdate(assignCte: String, outCte: String): String =
    s"""$outCte AS (
       |  SELECT cell AS c_id, list(mm ORDER BY pos) AS cv FROM (
       |    SELECT cell, pos, ${rnd("avg(val)")} AS mm
       |    FROM (SELECT cell, unnest(range(0, len(v))) AS pos, unnest(v) AS val FROM $assignCte)
       |    GROUP BY 1, 2)
       |  GROUP BY 1)""".stripMargin

  /** The batch IVF replay — shared verbatim by q_ann_ivf and its
   *  streamed-serving restatement q_stream_ann_query. */
  private val ivfOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$cents64Cte,
       |asg AS (
       |  SELECT vec_id, v, c_id AS cell FROM (
       |    SELECT e.vec_id, e.v, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
       |    FROM e, c)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, cell FROM asg WHERE $annQPred),
       |pairs AS (SELECT q_id, a.vec_id, ${rnd(cosSql("qv", "a.v"))} AS sim
       |          FROM q JOIN asg a USING (cell) WHERE a.vec_id != q_id)
       |SELECT q_id, rank, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM pairs)
       |WHERE rank <= 3""".stripMargin

  // integer-exact head cut + exact-count probabilities: both engines
  // divide the same integers and evaluate the identical ln expression;
  // the final round4 absorbs libm ULP differences. Shared verbatim by
  // the batch query and the ingest-maintained streamed restatement.
  private val driftOracle: String =
    raw"""WITH stoks AS (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS t
       |               FROM documents),
       |u AS (SELECT source, unnest(t) AS tk FROM stoks),
       |tf AS (SELECT source, tk, count(*) AS c FROM u WHERE tk <> '' GROUP BY 1, 2),
       |head AS (SELECT tk, 1 AS inh FROM (
       |  SELECT tk, sum(c) AS tc FROM tf GROUP BY 1
       |  ORDER BY tc DESC, tk ASC LIMIT 24)),
       |b AS (SELECT source,
       |             CASE WHEN inh IS NOT NULL THEN tk ELSE '__other' END AS tok,
       |             sum(c) AS c
       |      FROM tf LEFT JOIN head USING (tk) GROUP BY 1, 2),
       |support AS (SELECT DISTINCT tok FROM b),
       |srcs AS (SELECT DISTINCT source FROM b),
       |dense AS (SELECT s.source, sup.tok, coalesce(b.c, 0) AS c
       |          FROM srcs s CROSS JOIN support sup
       |          LEFT JOIN b ON b.source = s.source AND b.tok = sup.tok),
       |tot AS (SELECT source, sum(c) AS n FROM dense GROUP BY 1),
       |p AS (SELECT d.source, d.tok, CAST(d.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p
       |      FROM dense d JOIN tot t USING (source)),
       |pairs AS (SELECT a.source AS source_a, b2.source AS source_b, a.tok,
       |                 a.p AS pa, b2.p AS pb
       |          FROM p a JOIN p b2 USING (tok) WHERE a.source < b2.source)
       |SELECT source_a, source_b,
       |       round(0.5 * sum(CASE WHEN pa > 0 THEN pa * ln(2 * pa / (pa + pb)) ELSE 0 END)
       |           + 0.5 * sum(CASE WHEN pb > 0 THEN pb * ln(2 * pb / (pa + pb)) ELSE 0 END),
       |             4) AS jsd
       |FROM pairs GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    // the 4×16 count-min grid cell by cell (md5 row hashes, min of the
    // token's cells), top-20 tokens by exact count
    "q_text_cms_tokens" ->
      raw"""WITH toks AS (
           |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tk
           |  FROM documents),
           |counts AS (SELECT tk, count(*) AS exact_n FROM toks GROUP BY 1),
           |top AS (SELECT * FROM counts ORDER BY exact_n DESC, tk LIMIT 20),
           |drows AS (SELECT unnest([0, 1, 2, 3]) AS i),
           |cells AS (
           |  SELECT i, ${bh(s"CAST(i AS VARCHAR) || '|' || tk")} % 16 AS j,
           |         count(*) AS cnt
           |  FROM toks CROSS JOIN drows GROUP BY 1, 2),
           |est AS (
           |  SELECT t.tk, min(coalesce(c.cnt, 0)) AS est_n
           |  FROM top t CROSS JOIN drows d
           |  LEFT JOIN cells c ON c.i = d.i
           |    AND c.j = ${bh(s"CAST(d.i AS VARCHAR) || '|' || t.tk")} % 16
           |  GROUP BY 1)
           |SELECT t.tk AS token, t.exact_n, e.est_n
           |FROM top t JOIN est e ON e.tk = t.tk""".stripMargin,

    "q_dedup_exact" ->
      raw"""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
           |       min(doc_id) AS canonical_id, count(*) AS n_copies
           |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_incremental" ->
      raw"""WITH hashed AS (
           |  SELECT doc_id,
           |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash
           |  FROM documents)
           |SELECT doc_id, content_hash FROM hashed new
           |WHERE new.doc_id % 3 = 0
           |  AND NOT EXISTS (
           |    SELECT 1 FROM hashed ref
           |    WHERE ref.doc_id % 2 = 0 AND ref.content_hash = new.content_hash)""".stripMargin,

    "q_dedup_near" ->
      s"""WITH $candCtes
         |SELECT * FROM (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(range(1, ${NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) / $NumPerms.0 AS est_jaccard
         |  FROM cand
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b)
         |WHERE est_jaccard >= 0.5""".stripMargin,

    "q_dedup_near_incremental" ->
      s"""WITH $candCtes,
         |xc AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
         |       FROM bands a JOIN bands b ON a.bi = b.bi AND a.key = b.key
         |       WHERE a.doc_id % 3 = 0 AND b.doc_id % 2 = 0
         |         AND a.doc_id != b.doc_id)
         |SELECT * FROM (
         |  SELECT new_id, ref_id,
         |         len(list_filter(range(1, ${NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) / $NumPerms.0 AS est_jaccard
         |  FROM xc
         |  JOIN sigs sa ON sa.doc_id = new_id
         |  JOIN sigs sb ON sb.doc_id = ref_id)
         |WHERE est_jaccard >= 0.5""".stripMargin,

    // admitted = new-slice docs with NO reference near-dup: the
    // q_dedup_near_incremental replay inverted into an anti-filter
    "q_stream_near_admission" ->
      s"""WITH $candCtes,
         |xc AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
         |       FROM bands a JOIN bands b ON a.bi = b.bi AND a.key = b.key
         |       WHERE a.doc_id % 3 = 0 AND b.doc_id % 2 = 0),
         |dup AS (SELECT DISTINCT new_id FROM (
         |  SELECT new_id,
         |         len(list_filter(range(1, ${NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) / $NumPerms.0 AS ej
         |  FROM xc
         |  JOIN sigs sa ON sa.doc_id = new_id
         |  JOIN sigs sb ON sb.doc_id = ref_id)
         |  WHERE ej >= 0.5)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT new_id FROM dup)""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $candCtes
         |SELECT * FROM (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |           / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = doc_a
         |  JOIN sh sb ON sb.doc_id = doc_b)
         |WHERE jaccard >= 0.3""".stripMargin,

    // the S-curve is closed-form: both engines evaluate the identical
    // IEEE-double expression over the same integer grid (the repo's
    // round-4 discipline absorbs libm ULP differences)
    "q_dedup_band_plan" ->
      s"""SELECT round(i/20.0, 2) AS s,
         |  round(1 - power(1 - power(i/20.0, $RowsPerBand), $NumBands), 4) AS p_candidate,
         |  round(power(1.0/$NumBands, 1.0/$RowsPerBand), 4) AS threshold_approx,
         |  round(power(1 - power(2.0, -1.0/$NumBands), 1.0/$RowsPerBand), 4) AS s50
         |FROM range(1, 20) AS t(i)""".stripMargin,

    // estimate-vs-exact confusion over the same candidate set
    "q_dedup_minhash_eval" ->
      s"""WITH $candCtes,
         |pe AS (
         |  SELECT doc_a, doc_b,
         |    len(list_filter(range(1, ${NumPerms + 1}), i -> ga.sig[i] = gb.sig[i])) / $NumPerms.0 AS est,
         |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS ex
         |  FROM cand
         |  JOIN sigs ga ON ga.doc_id = doc_a
         |  JOIN sigs gb ON gb.doc_id = doc_b
         |  JOIN sh sa ON sa.doc_id = doc_a
         |  JOIN sh sb ON sb.doc_id = doc_b)
         |SELECT
         |  CAST(count(*) FILTER (WHERE est >= 0.5 AND ex >= 0.5) AS BIGINT) AS tp,
         |  CAST(count(*) FILTER (WHERE est >= 0.5 AND ex < 0.5) AS BIGINT) AS fp,
         |  CAST(count(*) FILTER (WHERE est < 0.5 AND ex >= 0.5) AS BIGINT) AS fn,
         |  CAST(count(*) FILTER (WHERE est < 0.5 AND ex < 0.5) AS BIGINT) AS tn,
         |  ${rnd("avg(" + rnd("abs(est - ex)") + ")")} AS mean_abs_err
         |FROM pe""".stripMargin,

    // connected components as a recursive transitive closure: min
    // reachable id == the propagation fixpoint the Spark side converges to
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $candCtes,
         |$clusterCtes
         |SELECT doc AS doc_id, cluster_id FROM cl""".stripMargin,

    // quality ∧ exact-canonical ∧ cluster-representative, all replayed
    "q_pipeline_corpus" ->
      s"""WITH RECURSIVE $candCtes,
         |$clusterCtes,
         |m AS (SELECT doc_id,
         |             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mtl,
         |             CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS sr,
         |             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
         |             len(t) AS n
         |      FROM toks),
         |ex AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
         |       FROM documents),
         |exmin AS (SELECT h, min(doc_id) AS canon FROM ex GROUP BY 1)
         |SELECT m.doc_id, ${rnd("((m.mtl / 10.0 + m.sr) + m.ttr)")} AS quality_score
         |FROM m
         |JOIN ex ON ex.doc_id = m.doc_id
         |JOIN exmin ON exmin.h = ex.h
         |LEFT JOIN cl ON cl.doc = m.doc_id
         |WHERE m.n >= 8 AND m.n <= 100000 AND m.sr > 0.0 AND m.ttr > 0.1
         |  AND exmin.canon = m.doc_id
         |  AND (cl.cluster_id IS NULL OR cl.cluster_id = m.doc_id)""".stripMargin,

    // the q_pipeline_corpus replay with the best-quality cluster
    // representative: rank members on the SAME round4 snap Spark uses
    "q_pipeline_corpus_best" ->
      s"""WITH RECURSIVE $candCtes,
         |$clusterCtes,
         |m AS (SELECT doc_id,
         |             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mtl,
         |             CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS sr,
         |             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
         |             len(t) AS n
         |      FROM toks),
         |ex AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
         |       FROM documents),
         |exmin AS (SELECT h, min(doc_id) AS canon FROM ex GROUP BY 1),
         |best AS (SELECT cluster_id, doc AS best_id FROM (
         |    SELECT cl.cluster_id, cl.doc,
         |           row_number() OVER (PARTITION BY cl.cluster_id
         |             ORDER BY ${rnd("((m2.mtl / 10.0 + m2.sr) + m2.ttr)")} DESC, cl.doc ASC) AS rn
         |    FROM cl JOIN m m2 ON m2.doc_id = cl.doc) WHERE rn = 1)
         |SELECT m.doc_id, ${rnd("((m.mtl / 10.0 + m.sr) + m.ttr)")} AS quality_score
         |FROM m
         |JOIN ex ON ex.doc_id = m.doc_id
         |JOIN exmin ON exmin.h = ex.h
         |LEFT JOIN cl ON cl.doc = m.doc_id
         |LEFT JOIN best ON best.cluster_id = cl.cluster_id
         |WHERE m.n >= 8 AND m.n <= 100000 AND m.sr > 0.0 AND m.ttr > 0.1
         |  AND exmin.canon = m.doc_id
         |  AND (cl.cluster_id IS NULL OR best.best_id = m.doc_id)""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH $toksCte,
         |th AS (SELECT doc_id, list_transform(t, x -> ${bh("x")}) AS h FROM toks),
         |fp AS (SELECT doc_id, $simhashExpr AS simhash FROM th)
         |SELECT simhash, count(*) AS n_docs, min(doc_id) AS canonical_id
         |FROM fp GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "q_dedup_simhash_near" ->
      s"""WITH $toksCte,
         |th AS (SELECT doc_id, list_transform(t, x -> ${bh("x")}) AS h FROM toks),
         |fp AS (SELECT doc_id, $simhashExpr AS simhash FROM th),
         |blk AS (SELECT doc_id, simhash, bi, (simhash >> (bi*7)) & 127 AS v
         |        FROM fp, range(0, 4) AS r(bi))
         |SELECT DISTINCT doc_a, doc_b, hamming FROM (
         |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
         |  FROM blk a JOIN blk b2 ON a.bi = b2.bi AND a.v = b2.v AND a.doc_id < b2.doc_id)
         |WHERE hamming <= 3""".stripMargin,

    // capped block buckets (HAVING count <= 40) ∪ exact-collision stars
    "q_dedup_simhash_capped" ->
      s"""WITH $toksCte,
         |th AS (SELECT doc_id, list_transform(t, x -> ${bh("x")}) AS h FROM toks),
         |fp AS (SELECT doc_id, $simhashExpr AS simhash FROM th),
         |blk AS (SELECT doc_id, simhash, bi, (simhash >> (bi*7)) & 127 AS v
         |        FROM fp, range(0, 4) AS r(bi)),
         |ok AS (SELECT bi, v FROM blk GROUP BY bi, v HAVING count(*) <= 40),
         |blkc AS (SELECT blk.* FROM blk JOIN ok USING (bi, v)),
         |lsh AS (
         |  SELECT DISTINCT doc_a, doc_b, hamming FROM (
         |    SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |           bit_count(xor(a.simhash, b2.simhash)) AS hamming
         |    FROM blkc a JOIN blkc b2
         |      ON a.bi = b2.bi AND a.v = b2.v AND a.doc_id < b2.doc_id)
         |  WHERE hamming <= 3),
         |grp AS (SELECT simhash, min(doc_id) AS canon FROM fp
         |        GROUP BY 1 HAVING count(*) >= 2),
         |star AS (SELECT g.canon AS doc_a, f.doc_id AS doc_b, 0::BIGINT AS hamming
         |         FROM grp g JOIN fp f USING (simhash)
         |         WHERE f.doc_id != g.canon)
         |SELECT DISTINCT doc_a, doc_b, hamming FROM
         |  (SELECT * FROM lsh UNION ALL SELECT * FROM star)""".stripMargin,

    "q_pipeline_topk_domain" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id,
         |             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mtl,
         |             CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS sr,
         |             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
         |      FROM toks),
         |l AS (SELECT doc_id, $langPred AS pred_lang FROM toks),
         |sc AS (SELECT m.doc_id, l.pred_lang, ((m.mtl / 10.0 + m.sr) + m.ttr) AS score
         |       FROM m JOIN l USING (doc_id))
         |SELECT doc_id, pred_lang, rank, ${rnd("score")} AS quality_score FROM (
         |  SELECT doc_id, pred_lang, score,
         |         row_number() OVER (PARTITION BY pred_lang ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 25""".stripMargin,

    "q_pipeline_budget" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, len(t) AS n_tokens,
         |             ${rnd("((CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) / 10.0" +
                s" + CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t))" +
                s" + CAST(len(list_distinct(t)) AS DOUBLE) / len(t))")} AS score
         |      FROM toks),
         |p AS (SELECT doc_id, n_tokens, score,
         |             coalesce(sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |      FROM m)
         |SELECT doc_id, n_tokens, score AS quality_score FROM p
         |WHERE before < 20000""".stripMargin,

    "q_pipeline_sample_weighted" ->
      s"""WITH $toksCte,
         |w AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |k AS (SELECT doc_id, n_tokens,
         |             ${rnd(s"-ln((${bh("doc_id::VARCHAR || 'w8'")} + 1) / 268435457.0) / n_tokens", 8)} AS draw
         |      FROM w)
         |SELECT doc_id, n_tokens FROM k
         |QUALIFY row_number() OVER (ORDER BY draw ASC, doc_id ASC) <= 100""".stripMargin,

    "q_pipeline_gopher" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk FROM toks),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |               CAST(sum(length(tk)) AS BIGINT) AS tok_chars,
         |               CAST(count(DISTINCT CASE WHEN list_contains($stopList, tk) THEN tk END) AS BIGINT)
         |                 AS n_stop_distinct
         |        FROM u GROUP BY 1),
         |ch AS (SELECT doc_id, length(text) AS n_chars,
         |              length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS sym_chars
         |       FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |                i -> t[i] || ' ' || t[i+1])) AS g
         |       FROM toks WHERE len(t) >= 2),
         |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |bgt AS (SELECT doc_id, CAST(max(c * length(g)) AS BIGINT) AS cover FROM bgc GROUP BY 1),
         |fg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-3),
         |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
         |       FROM toks WHERE len(t) >= 5),
         |fgc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY 1, 2),
         |fgd AS (SELECT doc_id, CAST(sum(c * length(g)) AS BIGINT) AS dup5
         |        FROM fgc WHERE c >= 2 GROUP BY 1),
         |j AS (SELECT doc_id, n_tok, tok_chars, n_stop_distinct, n_chars, sym_chars,
         |             coalesce(cover, 0) AS cover, coalesce(dup5, 0) AS dup5,
         |             tok_chars + n_tok - 1 AS total_chars
         |      FROM tot JOIN ch USING (doc_id)
         |      LEFT JOIN bgt USING (doc_id) LEFT JOIN fgd USING (doc_id))
         |SELECT doc_id, n_tok AS n_tokens,
         |       ${rnd("CAST(tok_chars AS DOUBLE) / n_tok")} AS mean_token_len,
         |       ${rnd("CAST(sym_chars AS DOUBLE) / n_chars")} AS symbol_ratio,
         |       n_stop_distinct,
         |       ${rnd("CAST(cover AS DOUBLE) / total_chars")} AS top_bigram_frac,
         |       ${rnd("CAST(dup5 AS DOUBLE) / total_chars")} AS dup_5gram_frac,
         |       (n_tok >= 50 AND n_tok <= 100000) AS r_count,
         |       (tok_chars >= n_tok * 3 AND tok_chars <= n_tok * 10) AS r_wordlen,
         |       (sym_chars * 10 <= n_chars) AS r_symbol,
         |       (n_stop_distinct >= 2) AS r_stop,
         |       (cover * 5 <= total_chars AND dup5 * 20 <= total_chars * 3) AS r_rep,
         |       ((n_tok >= 50 AND n_tok <= 100000)
         |        AND (tok_chars >= n_tok * 3 AND tok_chars <= n_tok * 10)
         |        AND (sym_chars * 10 <= n_chars)
         |        AND (n_stop_distinct >= 2)
         |        AND (cover * 5 <= total_chars AND dup5 * 20 <= total_chars * 3)) AS keep
         |FROM j""".stripMargin,

    "q_pipeline_ccnet" ->
      s"""WITH $toksCte,
         |b AS (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM toks WHERE len(t) >= 2),
         |pairs AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM b),
         |bg AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cnt1 FROM bg GROUP BY 1),
         |lp AS (SELECT doc_id,
         |              ${rnd("sum(ln(CAST(cb AS DOUBLE) / CAST(cnt1 AS DOUBLE))) / CAST(count(*) AS DOUBLE)")} AS score
         |       FROM pairs JOIN bg USING (w1, w2) JOIN c1 USING (w1)
         |       GROUP BY doc_id),
         |lg AS (SELECT doc_id, $langPred AS pred_lang FROM toks),
         |sc AS (SELECT doc_id, pred_lang, score FROM lp JOIN lg USING (doc_id)),
         |hist AS (SELECT pred_lang, score, count(*) AS n FROM sc GROUP BY 1, 2),
         |hb AS (SELECT *,
         |              coalesce(sum(n) OVER (PARTITION BY pred_lang ORDER BY score DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         |              sum(n) OVER (PARTITION BY pred_lang) AS total
         |       FROM hist),
         |bk AS (SELECT pred_lang, score,
         |              CASE WHEN before * 1000 < total * 333 THEN 'head'
         |                   WHEN before * 1000 >= total * (1000 - 333) THEN 'tail'
         |                   ELSE 'middle' END AS bucket
         |       FROM hb)
         |SELECT doc_id, pred_lang, score AS lm_logprob, bucket, bucket <> 'tail' AS keep
         |FROM sc JOIN bk USING (pred_lang, score)""".stripMargin,

    "q_pipeline_dsir" ->
      s"""WITH tkb AS (
         |  SELECT doc_id, source IN ('src0', 'src1') AS tt,
         |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tk
         |  FROM documents),
         |tb AS (SELECT doc_id, tt, ${bh("tk")} % 4096 AS b FROM tkb),
         |st AS (SELECT b,
         |              sum(CASE WHEN tt THEN 1 ELSE 0 END) AS ct,
         |              sum(CASE WHEN tt THEN 0 ELSE 1 END) AS cr
         |       FROM tb GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr FROM st),
         |wt AS (SELECT b,
         |              CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(nt + 4096 AS DOUBLE)) /
         |                            (CAST(cr + 1 AS DOUBLE) / CAST(nr + 4096 AS DOUBLE))) * 10000)
         |                   AS BIGINT) AS w
         |       FROM st CROSS JOIN tot),
         |sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS s, count(*) AS n_tokens
         |       FROM tb JOIN wt USING (b) WHERE NOT tt GROUP BY 1)
         |SELECT doc_id, n_tokens, CAST(s AS DOUBLE) / CAST(10000 AS DOUBLE) AS dsir_score
         |FROM sc
         |QUALIFY row_number() OVER (ORDER BY s DESC, doc_id ASC) <= 200""".stripMargin,

    "q_pipeline_budget_domain" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id, len(t) AS n_tokens,
         |             ${rnd("((CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) / 10.0" +
                s" + CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t))" +
                s" + CAST(len(list_distinct(t)) AS DOUBLE) / len(t))")} AS score
         |      FROM toks),
         |l AS (SELECT doc_id, $langPred AS pred_lang FROM toks),
         |p AS (SELECT m.doc_id, l.pred_lang, m.n_tokens, m.score,
         |             coalesce(sum(m.n_tokens) OVER (PARTITION BY l.pred_lang
         |               ORDER BY m.score DESC, m.doc_id ASC
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |      FROM m JOIN l USING (doc_id))
         |SELECT doc_id, pred_lang, n_tokens, score AS quality_score FROM p
         |WHERE before < 5000""".stripMargin,

    "q_pipeline_split" ->
      s"""SELECT doc_id,
         |       CASE WHEN ${bh("'s1' || CAST(doc_id AS VARCHAR)")} % 1000 < 800 THEN 'train'
         |            WHEN ${bh("'s1' || CAST(doc_id AS VARCHAR)")} % 1000 < 900 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "q_pipeline_shuffle" ->
      s"""WITH h AS (SELECT doc_id, ${bh("'e0' || CAST(doc_id AS VARCHAR)")} AS hh
         |           FROM documents)
         |SELECT doc_id, hh % 8 AS shard,
         |       row_number() OVER (PARTITION BY hh % 8
         |         ORDER BY hh ASC, doc_id ASC) AS pos
         |FROM h""".stripMargin,

    "q_text_bm25" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk FROM toks),
         |dc AS (SELECT doc_id, tk, count(*) AS tf FROM u GROUP BY 1, 2),
         |dln AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dc GROUP BY 1),
         |dfq AS (SELECT tk, count(*) AS df FROM dc GROUP BY 1),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS toks FROM dln),
         |q AS (SELECT DISTINCT doc_id AS query_id, unnest(t) AS tk FROM toks
         |      WHERE doc_id % 211 = 0 AND doc_id < 10550),
         |qt AS (SELECT DISTINCT tk FROM q),
         |p AS (
         |  SELECT dc.tk, dc.doc_id, df,
         |         (CAST(tf AS DOUBLE) * ${1.2 + 1}) /
         |         (CAST(tf AS DOUBLE) + 1.2 * (${1 - 0.75} + 0.75 * CAST(dl AS DOUBLE) /
         |            (CAST(toks AS DOUBLE) / CAST(n AS DOUBLE)))) AS wtf,
         |         CAST(n AS DOUBLE) AS nd
         |  FROM dc
         |  JOIN qt USING (tk)
         |  JOIN dfq USING (tk)
         |  JOIN dln USING (doc_id), c),
         |pt AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY tk
         |                               ORDER BY wtf DESC, doc_id ASC) AS prank
         |  FROM p) WHERE prank <= 200),
         |sc AS (
         |  SELECT q.query_id, pt.doc_id,
         |         sum(ln((nd - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
         |             * wtf) AS score
         |  FROM pt
         |  JOIN q USING (tk)
         |  GROUP BY 1, 2)
         |SELECT query_id, rank, doc_id, score FROM (
         |  SELECT query_id, doc_id, ${rnd("score")} AS score,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY ${rnd("score")} DESC, doc_id ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 5""".stripMargin,

    "q_text_keywords" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk FROM toks),
         |dc AS (SELECT doc_id, tk, count(*) AS tf FROM u GROUP BY 1, 2),
         |dfq AS (SELECT tk, count(*) AS df FROM dc GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |sc AS (SELECT doc_id, tk, tf * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) AS score
         |       FROM dc JOIN dfq USING (tk), n)
         |SELECT doc_id, rank, token, tfidf FROM (
         |  SELECT doc_id, tk AS token, ${rnd("score")} AS tfidf,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tk ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 3""".stripMargin,

    "q_pipeline_chunks" ->
      s"""WITH $toksCte,
         |c AS (SELECT doc_id, t,
         |             unnest(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT))) AS chunk_id
         |      FROM toks)
         |SELECT doc_id, chunk_id,
         |       CAST(len(list_slice(t, chunk_id*32 + 1, chunk_id*32 + 32)) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(list_slice(t, chunk_id*32 + 1, chunk_id*32 + 32), ' ')) AS chunk_fp
         |FROM c""".stripMargin,

    "q_pipeline_novelty" ->
      s"""WITH $toksCte,
         |$shCte,
         |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |nw AS (SELECT doc_id, g FROM u WHERE doc_id % 2 = 1),
         |ref AS (SELECT DISTINCT g FROM u WHERE doc_id % 2 = 0)
         |SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         |         CAST(count(*) AS DOUBLE) AS novelty
         |FROM nw n LEFT JOIN ref r ON n.g = r.g
         |GROUP BY 1""".stripMargin,

    "q_pipeline_decontam" ->
      s"""WITH $toksCte,
         |$shCte,
         |ev AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id AS train_id, unnest(s) AS g FROM sh WHERE doc_id % 97 != 0),
         |ov AS (SELECT train_id, eval_id, count(*) AS n_overlap
         |       FROM tr JOIN ev USING (g) GROUP BY 1, 2),
         |ec AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1)
         |SELECT train_id, eval_id, CAST(n_overlap AS BIGINT) AS n_overlap,
         |       CAST(n_overlap AS DOUBLE) / n_eval AS overlap_frac
         |FROM ov JOIN ec USING (eval_id)
         |WHERE n_overlap >= 2""".stripMargin,

    "q_pipeline_decontam_clean" ->
      s"""WITH $toksCte,
         |$shCte,
         |ev AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id AS train_id, unnest(s) AS g FROM sh WHERE doc_id % 97 != 0),
         |bad AS (SELECT DISTINCT train_id FROM (
         |          SELECT train_id, eval_id, count(*) AS n
         |          FROM tr JOIN ev USING (g) GROUP BY 1, 2)
         |        WHERE n >= 2)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 97 != 0
         |  AND doc_id NOT IN (SELECT train_id FROM bad)""".stripMargin,

    "q_pipeline_decontam_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |ev AS (SELECT vec_id AS eval_id, v FROM e WHERE vec_id < 100),
         |tr AS (SELECT vec_id, v FROM e WHERE vec_id >= 100),
         |p AS (SELECT tr.vec_id, ev.eval_id, ${rnd(cosSql("tr.v", "ev.v"))} AS c
         |      FROM tr, ev WHERE tr.vec_id <> ev.eval_id)
         |SELECT vec_id, eval_id, c AS cos_sim FROM p
         |WHERE c >= 0.3
         |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, eval_id DESC) = 1""".stripMargin,

    "q_text_repetition" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk, unnest(range(1, len(t)+1)) AS pos FROM toks),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |               CAST(sum(length(tk)) + count(*) - 1 AS BIGINT) AS total_chars
         |        FROM u GROUP BY 1),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |                i -> t[i] || ' ' || t[i+1])) AS g
         |       FROM toks WHERE len(t) >= 2),
         |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |bgt AS (SELECT doc_id, CAST(max(c * length(g)) AS BIGINT) AS cover FROM bgc GROUP BY 1),
         |fg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-3),
         |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
         |       FROM toks WHERE len(t) >= 5),
         |fgc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY 1, 2),
         |fgd AS (SELECT doc_id, CAST(sum(c * length(g)) AS BIGINT) AS dup5
         |        FROM fgc WHERE c >= 2 GROUP BY 1),
         |r AS (SELECT doc_id, pos,
         |             CASE WHEN lag(tk) OVER (PARTITION BY doc_id ORDER BY pos)
         |                  IS DISTINCT FROM tk THEN 1 ELSE 0 END AS chg
         |      FROM u),
         |rid AS (SELECT doc_id, pos,
         |               sum(chg) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
         |        FROM r),
         |runs AS (SELECT doc_id, run_id, count(*) AS rl FROM rid GROUP BY 1, 2),
         |mr AS (SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_token_run FROM runs GROUP BY 1)
         |SELECT t.doc_id, t.n_tokens,
         |       coalesce(bgt.cover, 0) AS top_bigram_cover,
         |       CAST(coalesce(bgt.cover, 0) AS DOUBLE) / t.total_chars AS top_bigram_frac,
         |       coalesce(fgd.dup5, 0) AS dup_5gram_chars,
         |       CAST(coalesce(fgd.dup5, 0) AS DOUBLE) / t.total_chars AS dup_5gram_frac,
         |       mr.max_token_run
         |FROM tot t
         |LEFT JOIN bgt USING (doc_id)
         |LEFT JOIN fgd USING (doc_id)
         |JOIN mr USING (doc_id)""".stripMargin,

    "q_text_logprob" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk FROM toks),
         |dc AS (SELECT doc_id, tk, count(*) AS c FROM u GROUP BY 1, 2),
         |v AS (SELECT tk, count(*) AS cnt FROM u GROUP BY 1),
         |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |       ${rnd("sum(c * ln(CAST(cnt AS DOUBLE) / total)) / CAST(sum(c) AS DOUBLE)")} AS avg_logprob,
         |       ${rnd("ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE)")} AS entropy
         |FROM dc JOIN v USING (tk), tt
         |GROUP BY doc_id""".stripMargin,

    "q_text_bigram_lm" ->
      s"""WITH $toksCte,
         |b AS (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM toks WHERE len(t) >= 2),
         |pairs AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM b),
         |bg AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cnt1 FROM bg GROUP BY 1),
         |head AS (SELECT w1, cnt1 FROM c1 ORDER BY cnt1 DESC, w1 ASC LIMIT 16),
         |st AS (SELECT w1, w2, cb, cnt1 FROM bg JOIN head USING (w1)
         |       QUALIFY row_number() OVER (PARTITION BY w1 ORDER BY cb DESC, w2 ASC) <= 8)
         |SELECT doc_id, count(*) AS n_bigrams,
         |       ${rnd("sum(ln(CAST(cb AS DOUBLE) / CAST(cnt1 AS DOUBLE))) / CAST(count(*) AS DOUBLE)")} AS avg_logprob2
         |FROM pairs JOIN st USING (w1, w2)
         |GROUP BY doc_id""".stripMargin,

    // the PMI walk restated: same head restriction, same restricted-
    // space marginals, same (rounded-pmi, w1, w2) cut order
    "q_text_pmi" -> pmiOracle,
    // the ingest-maintained restatement (summed unigram + pair count
    // logs) must be indistinguishable, whatever the micro-batch split
    "q_stream_pmi" -> pmiOracle,
    "q_stream_pmi_compacted" -> pmiOracle,

    "q_text_stats" ->
      raw"""WITH $toksCte
           |SELECT doc_id,
           |       len(t) AS n_tokens,
           |       len(list_distinct(t)) AS n_types,
           |       len(regexp_extract_all(lower(text), '${TextAnalysis.BpeRegex}')) AS n_bpe_tokens,
           |       length(text) AS n_chars,
           |       CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
           |       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
           |       CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS stopword_ratio,
           |       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS type_token_ratio
           |FROM toks""".stripMargin,

    "q_text_quality" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id,
         |             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mtl,
         |             CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS sr,
         |             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
         |             len(t) AS n
         |      FROM toks)
         |SELECT doc_id, mtl AS mean_token_len,
         |       ((mtl / 10.0 + sr) + ttr) AS quality_score,
         |       (n >= 8 AND n <= 100000 AND sr > 0.0 AND ttr > 0.1) AS keep
         |FROM m""".stripMargin,

    "q_text_langid" ->
      s"""WITH $toksCte
         |SELECT doc_id, lang, $langPred AS pred_lang, $langMax AS marker_hits
         |FROM toks""".stripMargin,

    "q_text_fingerprint" ->
      s"""WITH $toksCte,
         |th AS (SELECT doc_id, len(t) AS n, list_transform(t, x -> ${bh("x")}) AS h FROM toks),
         |w AS (SELECT doc_id,
         |             list_transform(range(1, n - ${FpWindow - 2}), i -> $fpWindowExpr) AS whs
         |      FROM th WHERE n >= $FpWindow)
         |SELECT doc_id, list_min(whs) AS min_fp, len(list_distinct(whs)) AS n_distinct_fp
         |FROM w""".stripMargin,

    "q_ann_brute" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |pairs AS (SELECT q_id, vec_id, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM q, e WHERE vec_id != q_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 5""".stripMargin,

    "q_ann_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e WHERE vec_id % 50 = 0),
         |pairs AS (SELECT q_id, vec_id, label, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM q, e WHERE label != q_label)
         |SELECT q_id, rank, vec_id, label, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 5""".stripMargin,

    "q_ann_buckets" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT $bucketExpr AS bucket, count(*) AS n_vecs
         |FROM e GROUP BY 1""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, $bucketExpr AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id % 25 = 0),
         |pairs AS (SELECT q_id, vec_id, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM q JOIN e USING (bucket) WHERE vec_id != q_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 3""".stripMargin,

    // full bit-exact replay of the 2-round Lloyd refinement: per-round
    // means are rounded to 4 decimals on BOTH engines (assign distances
    // were already rounded), so the sampled init, both refinement rounds,
    // the final assignment, and the in-cell top-k all replay identically
    "q_ann_kmeans" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS c_id, v AS cv FROM
         |  (SELECT vec_id, v FROM e ORDER BY $hashOrd ASC, vec_id ASC LIMIT $IvfK)),
         |${kmAssign("a1", "c0")},
         |${kmUpdate("a1", "c1")},
         |${kmAssign("a2", "c1")},
         |${kmUpdate("a2", "c2")},
         |${kmAssign("asg", "c2")},
         |q AS (SELECT vec_id AS q_id, v AS qv, cell FROM asg WHERE $annQPred),
         |pairs AS (SELECT q_id, a.vec_id, ${rnd(cosSql("qv", "a.v"))} AS sim
         |          FROM q JOIN asg a USING (cell) WHERE a.vec_id != q_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, $bucketExpr AS bucket FROM embeddings),
         |q0 AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id % 25 = 0),
         |q AS (SELECT q_id, qv, xor(bucket, m) AS bucket
         |      FROM q0, (SELECT unnest(${(0L +: (0 until NumPlanes).map(1L << _)).mkString("[", ", ", "]")}) AS m)),
         |pairs AS (SELECT q_id, vec_id, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM q JOIN e USING (bucket) WHERE vec_id != q_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_cluster_cap" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte,
         |${kmAssign("asg", "c")}
         |SELECT vec_id, cell, rank FROM (
         |  SELECT vec_id, cell,
         |         row_number() OVER (PARTITION BY cell
         |           ORDER BY ${bh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS rank
         |  FROM asg)
         |WHERE rank <= 5""".stripMargin,

    // serving a stream of requests == the batch IVF, per-query purity
    "q_stream_ann_query" -> ivfOracle,

    "q_stream_ann_assign" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte
         |SELECT vec_id, cell, d FROM (
         |  SELECT e.vec_id, c.c_id AS cell,
         |         ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} AS d,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |  FROM e, c)
         |WHERE rn = 1""".stripMargin,

    "q_ann_ivf" -> ivfOracle,

    "q_pipeline_sample" ->
      s"""SELECT doc_id FROM documents
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 1000 < 250""".stripMargin,

    "q_pipeline_sample_stratified" ->
      s"""WITH $toksCte
         |SELECT doc_id, $langPred AS pred_lang FROM toks
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 1000
         |      < CASE WHEN $langPred = 'de' THEN 300
         |             WHEN $langPred = 'en' THEN 800 ELSE 100 END""".stripMargin,

    "q_text_fertility" ->
      raw"""WITH $toksCte
           |SELECT lang, count(*) AS n_docs,
           |       CAST(sum(len(t)) AS BIGINT) AS n_words,
           |       CAST(sum(len(regexp_extract_all(lower(text), '${TextAnalysis.BpeRegex}'))) AS BIGINT)
           |         AS n_bpe_tokens,
           |       ${rnd("CAST(sum(len(regexp_extract_all(lower(text), '" + TextAnalysis.BpeRegex +
              "'))) AS DOUBLE) / CAST(sum(len(t)) AS DOUBLE)")} AS fertility
           |FROM toks GROUP BY 1""".stripMargin,

    "q_text_oov" ->
      s"""WITH $toksCte,
         |u AS (SELECT doc_id, unnest(t) AS tk FROM toks),
         |vocab AS (SELECT tk, 1 AS inv FROM (
         |  SELECT tk, count(*) AS c FROM u GROUP BY 1
         |  ORDER BY c DESC, tk ASC LIMIT 24)),
         |agg AS (SELECT doc_id, count(*) AS n_tokens,
         |               CAST(sum(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |        FROM u LEFT JOIN vocab USING (tk) GROUP BY 1)
         |SELECT doc_id, n_tokens, n_oov,
         |       ${rnd("CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS oov_rate
         |FROM agg""".stripMargin,

    // integer-exact head cut + exact-count probabilities: both engines
    // divide the same integers and evaluate the identical ln expression;
    // the final round4 absorbs libm ULP differences
    "q_text_drift" -> driftOracle,
    // the ingest-maintained restatement must be indistinguishable,
    // whatever the micro-batch split
    "q_stream_drift" -> driftOracle,
    // in-band-compacted count log: fold-then-sum == sum == batch recount
    "q_stream_drift_compacted" -> driftOracle,

    "q_pipeline_mix" ->
      s"""WITH tg(source, p) AS (VALUES ('src0', 500), ('src1', 300), ('src2', 200)),
         |counts AS (SELECT tg.source, tg.p, coalesce(c.n, 0) AS n FROM tg
         |           LEFT JOIN (SELECT source, count(*) AS n FROM documents
         |                      WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1) c
         |           USING (source)),
         |t AS (SELECT min(n * 1000 // p) AS t FROM counts),
         |q AS (SELECT tg.source, (p * t.t) // 1000 AS quota FROM tg JOIN t ON true),
         |ranked AS (SELECT doc_id, source,
         |                  row_number() OVER (PARTITION BY source
         |                    ORDER BY ${bh("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC) AS rn
         |           FROM documents WHERE source IN ('src0', 'src1', 'src2'))
         |SELECT doc_id, source FROM ranked JOIN q USING (source)
         |WHERE rn <= quota""".stripMargin,

    "q_pipeline_pack" ->
      s"""WITH $toksCte,
         |n AS (SELECT doc_id, len(t) AS n_tokens,
         |             ${bh("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM toks),
         |p AS (SELECT doc_id, n_tokens, shard,
         |             coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |      FROM n)
         |SELECT doc_id, n_tokens, shard,
         |       CAST(before // 512 AS BIGINT) AS bin,
         |       CAST(before % 512 AS BIGINT) AS bin_offset
         |FROM p""".stripMargin,

    "q_pipeline_pack_index" ->
      s"""WITH $toksCte,
         |n AS (SELECT doc_id, len(t) AS n_tokens,
         |             ${bh("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM toks),
         |p AS (SELECT doc_id, n_tokens, shard,
         |             coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |      FROM n),
         |b AS (SELECT doc_id, n_tokens, shard,
         |             CAST(before // 512 AS BIGINT) AS bin,
         |             CAST(before % 512 AS BIGINT) AS bin_offset
         |      FROM p)
         |SELECT shard, bin, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR),
         |                  ',' ORDER BY bin_offset ASC, doc_id ASC) AS boundaries
         |FROM b GROUP BY 1, 2""".stripMargin,

    "q_text_pii" ->
      s"""WITH r1 AS (SELECT doc_id, text,
         |              regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g') AS t1
         |            FROM documents),
         |r2 AS (SELECT doc_id, text, t1,
         |              regexp_replace(t1, '${TextAnalysis.Ipv4Re}', '<IP>', 'g') AS t2 FROM r1),
         |r3 AS (SELECT doc_id, text, t1, t2,
         |              regexp_replace(t2, '${TextAnalysis.DigitRunRe}', '<NUM>', 'g') AS t3 FROM r2)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(t1, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
         |       CAST(len(regexp_extract_all(t2, '${TextAnalysis.DigitRunRe}')) AS BIGINT) AS n_ids,
         |       CAST(length(t3) AS BIGINT) AS n_chars_redacted,
         |       md5(t3) AS redacted_hash
         |FROM r3""".stripMargin,

    "q_dedup_spans" ->
      s"""WITH $toksCte,
         |sp AS (SELECT doc_id, t, unnest(range(0, (len(t) - 16) // 8 + 1)) AS i
         |       FROM toks WHERE len(t) >= 16),
         |f AS (SELECT doc_id,
         |             md5(array_to_string(list_slice(t, i*8 + 1, i*8 + 16), ' ')) AS span_fp
         |      FROM sp)
         |SELECT span_fp, count(*) AS n_occurrences,
         |       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS canonical_id
         |FROM f GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    // batch restatement of the streamed scrub→gate→dedup ingest: one row
    // per distinct redacted-normalized content among gate-passing docs
    "q_stream_doc_pipeline" ->
      s"""WITH r AS (SELECT doc_id,
         |             regexp_replace(regexp_replace(regexp_replace(text,
         |               '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |               '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |               '${TextAnalysis.DigitRunRe}', '<NUM>', 'g') AS t3
         |           FROM documents),
         |tk AS (SELECT doc_id, t3,
         |              string_split_regex(trim(lower(t3)), '\\s+') AS t FROM r)
         |SELECT DISTINCT
         |       md5(regexp_replace(trim(lower(t3)), '\\s+', ' ', 'g')) AS content_hash,
         |       CAST(length(regexp_replace(trim(lower(t3)), '\\s+', ' ', 'g')) AS BIGINT)
         |         AS n_chars_norm
         |FROM tk
         |WHERE len(t) >= 8 AND len(t) <= 100000
         |  AND len(list_filter(t, x -> list_contains($stopList, x))) > 0
         |  AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) > 0.1""".stripMargin,

    // batch restatement of the streamed incremental-crawl decontam: one
    // row per distinct scrubbed content among odd-half gate-passers whose
    // content the even half's (scrubbed, gate-passing) output lacks
    "q_stream_doc_decontam" ->
      s"""WITH r AS (SELECT doc_id,
         |             regexp_replace(regexp_replace(regexp_replace(text,
         |               '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |               '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |               '${TextAnalysis.DigitRunRe}', '<NUM>', 'g') AS t3
         |           FROM documents),
         |tk AS (SELECT doc_id, t3,
         |              string_split_regex(trim(lower(t3)), '\\s+') AS t FROM r),
         |adm AS (SELECT doc_id,
         |               md5(regexp_replace(trim(lower(t3)), '\\s+', ' ', 'g')) AS h,
         |               CAST(length(regexp_replace(trim(lower(t3)), '\\s+', ' ', 'g')) AS BIGINT) AS nc
         |        FROM tk
         |        WHERE len(t) >= 8 AND len(t) <= 100000
         |          AND len(list_filter(t, x -> list_contains($stopList, x))) > 0
         |          AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) > 0.1)
         |SELECT DISTINCT h AS content_hash, nc AS n_chars_norm
         |FROM adm
         |WHERE doc_id % 2 != 0
         |  AND NOT EXISTS (SELECT 1 FROM adm ref
         |                  WHERE ref.doc_id % 2 = 0 AND ref.h = adm.h)""".stripMargin,

    "q_dedup_span_removal" ->
      s"""WITH $toksCte,
         |b AS (SELECT doc_id, t, unnest(range(0, (len(t) - 1) // 16 + 1)) AS bid
         |      FROM toks),
         |g AS (SELECT doc_id, bid,
         |             array_to_string(list_slice(t, bid*16 + 1, bid*16 + 16), ' ') AS c,
         |             md5(array_to_string(list_slice(t, bid*16 + 1, bid*16 + 16), ' ')) AS fp
         |      FROM b),
         |k AS (SELECT doc_id, bid, c FROM (
         |        SELECT doc_id, bid, c,
         |               row_number() OVER (PARTITION BY fp ORDER BY doc_id, bid) AS rn
         |        FROM g)
         |      WHERE rn = 1),
         |pd AS (SELECT doc_id, count(*) AS nb FROM g GROUP BY 1),
         |ka AS (SELECT doc_id, count(*) AS n_blocks_kept,
         |              sum(CASE WHEN c = '' THEN 0 ELSE len(string_split(c, ' ')) END) AS tk,
         |              md5(string_agg(c, ' ' ORDER BY bid)) AS kept_hash
         |       FROM k GROUP BY 1)
         |SELECT ka.doc_id, ka.n_blocks_kept,
         |       pd.nb - ka.n_blocks_kept AS n_blocks_dropped,
         |       CAST(ka.tk AS BIGINT) AS n_tokens_kept, ka.kept_hash
         |FROM ka JOIN pd USING (doc_id)""".stripMargin,

    "q_pipeline_chunks_strided" ->
      s"""WITH $toksCte,
         |c AS (SELECT doc_id, t, unnest(range(0, (len(t) - 1) // 16 + 1)) AS chunk_id
         |      FROM toks)
         |SELECT doc_id, chunk_id,
         |       CAST(chunk_id * 16 AS BIGINT) AS start_pos,
         |       CAST(len(list_slice(t, chunk_id*16 + 1, chunk_id*16 + 32)) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(list_slice(t, chunk_id*16 + 1, chunk_id*16 + 32), ' ')) AS chunk_fp
         |FROM c""".stripMargin,

    "q_pipeline_sample_temperature" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         |mn AS (SELECT min(n) AS n_min FROM c),
         |r AS (SELECT source,
         |             CAST(floor(700 * sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
         |               AS rate_permille
         |      FROM c, mn)
         |SELECT d.doc_id, d.source, r.rate_permille
         |FROM documents d JOIN r USING (source)
         |WHERE ${bh("CAST(d.doc_id AS VARCHAR)")} % 1000 < r.rate_permille""".stripMargin,

    "q_pipeline_quality_buckets" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id,
         |             ${rnd("((CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) / 10.0" +
                s" + CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t))" +
                s" + CAST(len(list_distinct(t)) AS DOUBLE) / len(t))")} AS score
         |      FROM toks),
         |h AS (SELECT score, count(*) AS n FROM m GROUP BY 1),
         |hb AS (SELECT score, n,
         |              coalesce(sum(n) OVER (ORDER BY score DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |       FROM h),
         |tt AS (SELECT count(*) AS total FROM m),
         |b AS (SELECT score,
         |             CASE WHEN before * 1000 < total * 333 THEN 'head'
         |                  WHEN before * 1000 >= total * 667 THEN 'tail'
         |                  ELSE 'middle' END AS bucket
         |      FROM hb, tt)
         |SELECT m.doc_id, m.score AS quality_score, b.bucket
         |FROM m JOIN b USING (score)""".stripMargin,

    "q_pipeline_epochs" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id,
         |             ${rnd("((CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) / 10.0" +
                s" + CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t))" +
                s" + CAST(len(list_distinct(t)) AS DOUBLE) / len(t))")} AS score
         |      FROM toks),
         |h AS (SELECT score, count(*) AS n FROM m GROUP BY 1),
         |hb AS (SELECT score, n,
         |              coalesce(sum(n) OVER (ORDER BY score DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |       FROM h),
         |tt AS (SELECT count(*) AS total FROM m),
         |b AS (SELECT score,
         |             CASE WHEN before * 1000 < total * 333 THEN 'head'
         |                  WHEN before * 1000 >= total * 667 THEN 'tail'
         |                  ELSE 'middle' END AS bucket
         |      FROM hb, tt),
         |assigned AS (SELECT m.doc_id, b.bucket,
         |                    CASE b.bucket WHEN 'head' THEN 3 WHEN 'middle' THEN 2
         |                         ELSE 1 END AS reps
         |             FROM m JOIN b USING (score))
         |SELECT doc_id, bucket, CAST(unnest(range(1, reps + 1)) AS INTEGER) AS epoch
         |FROM assigned""".stripMargin,

    // same assignment replay, but queries probe their 2 nearest cells
    "q_ann_ivf_probe" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte,
         |asg AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT e.vec_id, e.v, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |    FROM e, c)
         |  WHERE rn = 1),
         |qsel AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE $annQPred),
         |probe AS (
         |  SELECT q_id, qv, c_id AS cell FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |           row_number() OVER (PARTITION BY q.q_id
         |                              ORDER BY ${rnd("1.0 - (" + cosSql("q.qv", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |    FROM qsel q, c)
         |  WHERE rn <= 2),
         |pairs AS (SELECT q_id, a.vec_id, ${rnd(cosSql("qv", "a.v"))} AS sim
         |          FROM probe JOIN asg a USING (cell) WHERE a.vec_id != q_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte,
         |qsel AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE $annQPred),
         |bt AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |    FROM (SELECT q_id, vec_id, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM qsel, e WHERE vec_id != q_id))
         |  WHERE rank <= 3),
         |asg AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT e.vec_id, e.v, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |    FROM e, c)
         |  WHERE rn = 1),
         |probe AS (
         |  SELECT q_id, qv, c_id AS cell FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |           row_number() OVER (PARTITION BY q.q_id
         |                              ORDER BY ${rnd("1.0 - (" + cosSql("q.qv", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |    FROM qsel q, c)
         |  WHERE rn <= 2),
         |it AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |    FROM (SELECT q_id, a.vec_id, ${rnd(cosSql("qv", "a.v"))} AS sim
         |          FROM probe JOIN asg a USING (cell) WHERE a.vec_id != q_id))
         |  WHERE rank <= 3),
         |hits AS (SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |         FROM bt b JOIN it i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
         |         GROUP BY 1),
         |tot AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact FROM bt GROUP BY 1)
         |SELECT q_id, n_exact, coalesce(n_hit, 0) AS n_hit,
         |       ${rnd("CAST(coalesce(n_hit, 0) AS DOUBLE) / n_exact")} AS recall
         |FROM tot LEFT JOIN hits USING (q_id)""".stripMargin,

    // the truncation sweep: top-3 on list_slice(v, 1, dm) per ablation
    // dim vs the full-dim exact top-3
    "q_ann_trunc_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |qsel AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE $annQPred),
         |bt AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |    FROM (SELECT q_id, vec_id, ${rnd(cosSql("qv", "v"))} AS sim
         |          FROM qsel, e WHERE vec_id != q_id))
         |  WHERE rank <= 3),
         |dims AS (SELECT unnest([8, 16, 32]) AS trunc_dim),
         |tr AS (
         |  SELECT trunc_dim, q_id, vec_id FROM (
         |    SELECT trunc_dim, q_id, vec_id,
         |           row_number() OVER (PARTITION BY trunc_dim, q_id
         |                              ORDER BY sim DESC, vec_id ASC) AS rank
         |    FROM (SELECT d.trunc_dim, q.q_id, e.vec_id,
         |                 ${rnd(cosSql("list_slice(q.qv, 1, d.trunc_dim)",
                                        "list_slice(e.v, 1, d.trunc_dim)"))} AS sim
         |          FROM qsel q CROSS JOIN dims d CROSS JOIN e
         |          WHERE e.vec_id != q.q_id))
         |  WHERE rank <= 3),
         |hits AS (SELECT t.trunc_dim, t.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |         FROM tr t JOIN bt b ON b.q_id = t.q_id AND b.vec_id = t.vec_id
         |         GROUP BY 1, 2),
         |tot AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact FROM bt GROUP BY 1)
         |SELECT d.trunc_dim, t.q_id, t.n_exact, coalesce(h.n_hit, 0) AS n_hit,
         |       ${rnd("CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_exact")} AS recall
         |FROM tot t CROSS JOIN dims d
         |LEFT JOIN hits h ON h.trunc_dim = d.trunc_dim AND h.q_id = t.q_id""".stripMargin,

    "q_ann_pq_codes" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$pqCb32Cte,
         |sx AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS x
         |       FROM e, range(0, 8) AS r(sub)),
         |d AS (SELECT vec_id, sub, c_id,
         |             ${rnd("list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)")} AS d2
         |      FROM sx JOIN cb USING (sub))
         |SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, c_id AS code,
         |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c_id ASC) AS rn
         |  FROM d)
         |WHERE rn = 1""".stripMargin,

    "q_ann_pq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$pqCb32Cte,
         |sx AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS x
         |       FROM e, range(0, 8) AS r(sub)),
         |d AS (SELECT vec_id, sub, c_id,
         |             ${rnd("list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)")} AS d2
         |      FROM sx JOIN cb USING (sub)),
         |codes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, c_id AS code,
         |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c_id ASC) AS rn
         |  FROM d) WHERE rn = 1),
         |qt AS (SELECT vec_id AS q_id, sub, c_id AS code, d2 AS pd
         |       FROM d WHERE $annQPred),
         |adist AS (SELECT q_id, c.vec_id, ${rnd("sum(pd)")} AS adist
         |          FROM codes c JOIN qt USING (sub, code)
         |          GROUP BY 1, 2 HAVING c.vec_id != q_id)
         |SELECT q_id, rank, vec_id, adist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
         |  FROM adist)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_rerank" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$pqCb32Cte,
         |sx AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS x
         |       FROM e, range(0, 8) AS r(sub)),
         |d AS (SELECT vec_id, sub, c_id,
         |             ${rnd("list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)")} AS d2
         |      FROM sx JOIN cb USING (sub)),
         |codes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, c_id AS code,
         |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c_id ASC) AS rn
         |  FROM d) WHERE rn = 1),
         |qt AS (SELECT vec_id AS q_id, sub, c_id AS code, d2 AS pd
         |       FROM d WHERE $annQPred),
         |adist AS (SELECT q_id, c.vec_id, ${rnd("sum(pd)")} AS adist
         |          FROM codes c JOIN qt USING (sub, code)
         |          GROUP BY 1, 2 HAVING c.vec_id != q_id),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
         |  FROM adist)
         |WHERE rank <= 12),
         |exact AS (SELECT cand.q_id, cand.vec_id,
         |                 ${rnd(cosSql("q.v", "t.v"))} AS sim
         |          FROM cand
         |          JOIN e q ON q.vec_id = cand.q_id
         |          JOIN e t ON t.vec_id = cand.vec_id)
         |SELECT q_id, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
         |  FROM exact)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte,
         |asg AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.c_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY ${rnd("1.0 - (" + cosSql("e.v", "c.cv") + ")")} ASC, c.c_id ASC) AS rn
         |    FROM e, c)
         |  WHERE rn = 1),
         |$pqCb32Cte,
         |sx AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS x
         |       FROM e, range(0, 8) AS r(sub)),
         |d AS (SELECT vec_id, sub, c_id,
         |             ${rnd("list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)")} AS d2
         |      FROM sx JOIN cb USING (sub)),
         |codes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, c_id AS code,
         |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c_id ASC) AS rn
         |  FROM d) WHERE rn = 1),
         |cc AS (SELECT codes.vec_id, cell, sub, code FROM codes JOIN asg USING (vec_id)),
         |qt AS (SELECT d.vec_id AS q_id, a.cell, d.sub, d.c_id AS code, d.d2 AS pd
         |       FROM d JOIN asg a USING (vec_id) WHERE d.vec_id % 25 = 0 AND d.vec_id < 1000),
         |adist AS (SELECT q_id, cc.vec_id, ${rnd("sum(pd)")} AS adist
         |          FROM cc JOIN qt USING (cell, sub, code)
         |          GROUP BY 1, 2 HAVING cc.vec_id != q_id)
         |SELECT q_id, rank, vec_id, adist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
         |  FROM adist)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_ivfpq_residual" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$cents64Cte,
         |${kmAssign("asg", "c")},
         |res AS (
         |  SELECT a.vec_id, a.cell,
         |         list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS rv
         |  FROM asg a JOIN c ON a.cell = c.c_id),
         |rcb AS (SELECT vec_id AS c_id, sub, list_slice(rv, sub*8 + 1, sub*8 + 8) AS cv
         |  FROM (SELECT vec_id, rv FROM res ORDER BY $hashOrd ASC, vec_id ASC LIMIT $PqK),
         |       range(0, 8) AS r(sub)),
         |sx AS (SELECT vec_id, cell, sub, list_slice(rv, sub*8 + 1, sub*8 + 8) AS x
         |       FROM res, range(0, 8) AS r(sub)),
         |d AS (SELECT vec_id, cell, sub, c_id,
         |             ${rnd("list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)")} AS d2
         |      FROM sx JOIN rcb USING (sub)),
         |codes AS (SELECT vec_id, cell, sub, code FROM (
         |  SELECT vec_id, cell, sub, c_id AS code,
         |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c_id ASC) AS rn
         |  FROM d) WHERE rn = 1),
         |qt AS (SELECT vec_id AS q_id, cell, sub, c_id AS code, d2 AS pd
         |       FROM d WHERE $annQPred),
         |adist AS (SELECT q_id, codes.vec_id, ${rnd("sum(pd)")} AS adist
         |          FROM codes JOIN qt USING (cell, sub, code)
         |          GROUP BY 1, 2 HAVING codes.vec_id != q_id)
         |SELECT q_id, rank, vec_id, adist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
         |  FROM adist)
         |WHERE rank <= 3""".stripMargin,

    "q_ann_label_centroids" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
         |x AS (SELECT label AS grp, unnest(v) AS val, unnest(range(0, len(v))) AS dim FROM e)
         |SELECT grp, CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_vecs,
         |       ${rnd("avg(val)")} AS value
         |FROM x GROUP BY 1, 2""".stripMargin,

    // centroids snap to 4 decimals BEFORE the cosine: both engines dot
    // identical doubles, the final round4 absorbs sqrt/division ULP
    "q_embed_drift" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
         |x AS (SELECT label AS grp, unnest(v) AS val, unnest(range(0, len(v))) AS dim FROM e),
         |c AS (SELECT grp, dim, ${rnd("avg(val)")} AS value FROM x GROUP BY 1, 2)
         |SELECT a.grp AS grp_a, b.grp AS grp_b,
         |       round(sum(a.value * b.value) /
         |             (sqrt(sum(a.value * a.value)) * sqrt(sum(b.value * b.value))), 4)
         |         AS centroid_cos
         |FROM c a JOIN c b USING (dim)
         |WHERE a.grp < b.grp
         |GROUP BY 1, 2""".stripMargin,

    "q_ann_quantize" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |x AS (SELECT vec_id, unnest(range(0, len(v))) AS dim, unnest(v) AS val FROM e),
         |st AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM x GROUP BY 1)
         |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
         |       CAST(CASE WHEN hi = lo THEN 0
         |                 ELSE floor((val - lo) / (hi - lo) * 255 + 0.5) END AS BIGINT) AS q
         |FROM x JOIN st USING (dim)
         |WHERE vec_id % 50 = 0""".stripMargin,

    "q_dedup_embed_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ndBucketsCte,
         |np AS (SELECT DISTINCT vec_a, vec_b FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${rnd(cosSql("a.v", "b.v"))} AS sim
         |  FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |  WHERE sim >= 0.3),
         |edges AS (SELECT vec_a AS a, vec_b AS b FROM np
         |          UNION ALL SELECT vec_b, vec_a FROM np),
         |reach AS (
         |  SELECT DISTINCT a AS doc, a AS r FROM edges
         |  UNION
         |  SELECT g.a AS doc, reach.r FROM edges g JOIN reach ON reach.doc = g.b),
         |cl AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc)
         |SELECT doc AS vec_id, cluster_id FROM cl""".stripMargin,

    "q_dedup_hybrid_clusters" ->
      s"""WITH RECURSIVE $candCtes,
         |np1 AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b,
         |           len(list_filter(range(1, ${NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) / $NumPerms.0 AS ej
         |    FROM cand
         |    JOIN sigs sa ON sa.doc_id = doc_a
         |    JOIN sigs sb ON sb.doc_id = doc_b)
         |  WHERE ej >= 0.5),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ndBucketsCte,
         |np2 AS (SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, ${rnd(cosSql("a.v", "b.v"))} AS sim
         |  FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |  WHERE sim >= 0.3),
         |np AS (SELECT doc_a, doc_b FROM np1 UNION SELECT doc_a, doc_b FROM np2),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM np
         |          UNION ALL SELECT doc_b, doc_a FROM np),
         |reach AS (
         |  SELECT DISTINCT a AS doc, a AS r FROM edges
         |  UNION
         |  SELECT g.a AS doc, reach.r FROM edges g JOIN reach ON reach.doc = g.b),
         |cl AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc)
         |SELECT doc AS doc_id, cluster_id FROM cl""".stripMargin,

    "q_pipeline_report" ->
      s"""WITH RECURSIVE $candCtes,
         |$clusterCtes,
         |m AS (SELECT doc_id,
         |             CAST(len(list_filter(t, x -> list_contains($stopList, x))) AS DOUBLE) / len(t) AS sr,
         |             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
         |             len(t) AS n
         |      FROM toks),
         |ex AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
         |       FROM documents),
         |exmin AS (SELECT h, min(doc_id) AS canon FROM ex GROUP BY 1),
         |sel AS (SELECT m.doc_id, m.n
         |        FROM m
         |        JOIN ex ON ex.doc_id = m.doc_id
         |        JOIN exmin ON exmin.h = ex.h
         |        LEFT JOIN cl ON cl.doc = m.doc_id
         |        WHERE m.n >= 8 AND m.n <= 100000 AND m.sr > 0.0 AND m.ttr > 0.1
         |          AND exmin.canon = m.doc_id
         |          AND (cl.cluster_id IS NULL OR cl.cluster_id = m.doc_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(len(t)) AS BIGINT) AS tokens_total FROM toks),
         |qual AS (SELECT CAST(count(*) AS BIGINT) AS n_keep_quality FROM m
         |         WHERE n >= 8 AND n <= 100000 AND sr > 0.0 AND ttr > 0.1),
         |can AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_exact_canonical FROM ex),
         |clu AS (SELECT CAST(count(*) AS BIGINT) AS n_clustered_docs,
         |               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters FROM cl),
         |selagg AS (SELECT CAST(count(*) AS BIGINT) AS n_selected,
         |                  CAST(sum(n) AS BIGINT) AS tokens_selected FROM sel)
         |SELECT * FROM tot, qual, can, clu, selagg""".stripMargin,

    "q_dedup_embed_exact" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |f AS (SELECT vec_id,
         |             md5(array_to_string(list_transform(v,
         |               x -> CAST(${rnd("x*10000", 0)} AS BIGINT)), ',')) AS vec_fp
         |      FROM e)
         |SELECT vec_fp, min(vec_id) AS canonical_id, count(*) AS n_copies
         |FROM f GROUP BY 1""".stripMargin,

    "q_dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ndBucketsCte
         |SELECT DISTINCT vec_a, vec_b, sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${rnd(cosSql("a.v", "b.v"))} AS sim
         |  FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.3""".stripMargin,

    "q_mm_meta" ->
      s"""SELECT doc_id,
         |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         |       octet_length(encode(text)) AS byte_len,
         |       CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
         |       CAST(64 + (doc_id % 5) * 32 AS INT) AS height,
         |       n_chars * 10 AS duration_ms,
         |       ceil(octet_length(encode(text)) / ${Multimodal.FrameBytes}.0)::BIGINT AS n_frames
         |FROM documents""".stripMargin,

    "q_mm_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |         64 + (doc_id % 8) * 16 AS w, 64 + (doc_id % 5) * 32 AS h,
         |         lower(hex(encode(text))) AS hx,
         |         octet_length(encode(text)) AS len
         |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 0),
         |k AS (SELECT doc_id,
         |             greatest(least(ceil(len * (${32 * 32}.0 / (w * h)))::INT, len), 1) AS kb,
         |             hx
         |      FROM m)
         |SELECT doc_id, 32 AS width, 32 AS height, kb::BIGINT AS resized_bytes,
         |       substr(md5(substr(hx, 1, kb * 2)), 1, 12) AS resized_fp
         |FROM k""".stripMargin,

    "q_mm_frames" ->
      s"""WITH m AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
         |                  ceil(octet_length(encode(text)) / ${Multimodal.FrameBytes}.0)::BIGINT AS nf
         |           FROM documents),
         |f AS (SELECT doc_id, hx, unnest(range(0, nf)) AS frame_id FROM m)
         |SELECT doc_id, frame_id,
         |       (length(substr(hx, frame_id * ${Multimodal.FrameBytes * 2} + 1, ${Multimodal.FrameBytes * 2})) / 2)::BIGINT AS frame_bytes,
         |       substr(md5(substr(hx, frame_id * ${Multimodal.FrameBytes * 2} + 1, ${Multimodal.FrameBytes * 2})), 1, 12) AS frame_fp
         |FROM f""".stripMargin,

    "q_mm_features" -> {
      val feats = (0 until 4)
        .map(j => s"('0x' || substr(md5(lower(hex(encode(text)))), ${j * 7 + 1}, 7))::BIGINT / 268435456.0 AS f$j")
        .mkString(",\n       ")
      s"""SELECT doc_id,
         |       $feats
         |FROM documents""".stripMargin
    }
  )
}
