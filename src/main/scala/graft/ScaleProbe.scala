package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Scale-probe bench: runs the heavy pipeline/ANN queries on two
 * self-generated corpora 10× apart (same generator, same seed recipe,
 * same distributions) and reports the wall-time ratio per query — the
 * near-linearity evidence behind every "scales to 100 TB" docstring.
 *
 * The corpora mimic the driver testdata's shape (vocab-sampled texts
 * with planted exact/near dups; per-label anchored 64-dim embeddings)
 * but are generated HERE so both scale points come from one recipe —
 * `/root/testdata` is read-only and ships no sf1.
 *
 * Usage: `sbt "runMain graft.ScaleProbe [outJson] [names...]"`. Writes
 * one JSON object: per-query {small, large, ratio} seconds + row counts.
 * Documented super-linear rows (all with a linear-path sibling):
 *  - q_ann_brute: exhaustive scoring with query count ∝ n — O(n²) by
 *    contract; it is the correctness/recall baseline. The whole indexed
 *    family (q_ann_lsh, q_ann_ivf*, q_ann_kmeans, q_ann_pq*,
 *    q_ann_ivfpq) is declared over CONSTANT-k centroid/codebook tables
 *    and a bounded query batch since round 6 — measured near-linear.
 *  - q_dedup_embed* / q_dedup_simhash_near / q_dedup_near /
 *    q_dedup_near_incremental and friends: the cap-OFF exhaustive
 *    oracle paths — candidate volume is quadratic in bucket occupancy
 *    by definition, and this generator's 30-word vocabulary makes
 *    chance band collisions balloon at the 500k point. The capped production variants
 *    (q_dedup_simhash_capped, p_dedup_embed_capped,
 *    p_dedup_minhash_capped) are probed alongside and must stay
 *    near-linear; production raises planes/tables with corpus size
 *    (the explicit knobs on cosineNearDuplicates).
 *  - q_pipeline_decontam / q_pipeline_decontam_clean: the probe
 *    generator's 30-word vocabulary makes trigram shingles collide
 *    massively (overlap pairs 172k → 16.7M at 10×), so the maxDf-OFF
 *    oracle path is output-bound here by construction; the maxDf cap
 *    (the same boilerplate-shingle defense the operator documents) is
 *    the production path on high-collision corpora.
 *
 *  - q_dedup_ngram (probed across two decades since round 10) runs the
 *    verify-after-LSH Jaccard join over CAP-OFF candidates
 *    (maxBucketSize = ∞ — the oracle contract). Its cost has two
 *    components: the intersection join shuffles the FULL shingle table
 *    on doc keys (linear in corpus), plus per-pair intersection rows —
 *    and on this 30-word-vocab corpus pair volume grows super-linearly
 *    from chance band collisions (the decontam regime), which is the
 *    super-linear part of its r100. Measured: the bucket cap does NOT
 *    bind here (p_dedup_ngram_capped at cap=100 returns bit-identical
 *    rows — occupancies stay under the cap; the volume comes from MANY
 *    SMALL chance buckets), so the production mitigation on such
 *    corpora is raising NumBands/shingle length — the same explicit
 *    knobs the minhash rows document — not the cap.
 *
 *  - q_text_bm25 reads super-linear HERE because the probe corpus has
 *    a 30-word vocabulary: every query term occurs in essentially
 *    every document, so the postings restriction degenerates to
 *    all-pairs (pair count grows ~20× across the decade; wall grew
 *    7.5× — sub-linear in pairs). Real text is Zipfian with a long
 *    tail of selective terms; for stopword-heavy workloads
 *    `bm25TopK(maxDfFrac = …)` drops ~zero-idf terms before the join
 *    (the decontaminate maxDf convention).
 *
 *  - q_text_bigram_lm's decade-2 pressure was the per-doc lead()
 *    window sorting ~75M token rows at the 500k point; the
 *    slice/arrays_zip n-gram projection (TextAnalysis.ngramStructs)
 *    removed that sort entirely — measured 76.9 s → 46.3 s at 500k
 *    (r100 39× → 13×, r10 1.75× → 1.15×), p_dedup_minhash_capped
 *    24.6 s → 18.5 s, identical output rows. The projection pays
 *    ~1.3× more per-row byte copying at sf0.1 (slices copy
 *    UnsafeArrayData string bytes) — the right trade: CPU scales out,
 *    a per-key sort's spill does not.
 *
 *  - q_text_oov read decade2 = 15.07 in the round-8 in-suite sweep
 *    (0.38 → 5.74 s) — the only >10× decade in any artifact, seemingly
 *    contradicting the operator's "nothing token-keyed shuffles" plan
 *    claim. Round-9 isolated re-measure: 0.32 / 0.38 / 1.09 s,
 *    decade2 = 2.56 — suite/page-cache contamination, the round-5/6
 *    precedent again (as was the first xl4 sweep's dsir decade3 15.5,
 *    isolated 7.4). The plan claim stands; measure outliers ISOLATED
 *    before believing them.
 *
 * Three-point mode (`--xl`, BENCH_SCALE3.json) adds a 500k-doc decade
 * for the production-path family. Measured note: p_dedup_minhash_capped
 * reads r100 = 23× there, but its OUTPUT rows grow 61× in decade 2
 * (1.2k → 71k pairs — the same 30-word-vocab chance band collisions as
 * the decontam rows); wall per output row falls decade over decade, and
 * the production answer on such corpora is raising NumBands/row length
 * or tightening the cap, both explicit knobs.
 */
object ScaleProbe {

  private val Vocab = Array("batch", "part", "spark", "line", "column", "order", "small",
    "sort", "fast", "value", "scan", "hash", "slow", "group", "agg", "filter", "query",
    "big", "key", "window", "row", "table", "stream", "merge", "data", "vector", "a",
    "the", "join", "shard")
  private val Langs = Array("en", "en", "en", "de", "es", "fr", "zh")

  /** Deterministic LCG (same family as HashConstants.lcg). */
  private final class Lcg(seed: Long) {
    private var x = seed
    def next(): Long = { x = (1103515245L * x + 12345L) % 2147483648L; x }
    def nextInt(bound: Int): Int = (next() % bound).toInt
    def nextDouble(): Double = next().toDouble / 2147483648.0
  }

  def genDocs(spark: SparkSession, n: Int, dir: String): Unit = {
    import spark.implicits._
    val r = new Lcg(42)
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)](n)
    var prev = ""
    for (i <- 0 until n) {
      val text =
        if (i % 500 == 499 && prev.nonEmpty) prev // planted exact dup
        else if (i % 100 == 99 && prev.nonEmpty) { // planted near dup (one token swapped)
          val t = prev.split(" "); t(r.nextInt(t.length)) = Vocab(r.nextInt(Vocab.length))
          t.mkString(" ")
        } else {
          val len = 16 + r.nextInt(285)
          Seq.fill(len)(Vocab(r.nextInt(Vocab.length))).mkString(" ")
        }
      prev = text
      rows += ((i.toLong, text, Langs(r.nextInt(Langs.length)),
        s"src${r.nextInt(10)}", text.length.toLong))
    }
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def genEmbeddings(spark: SparkSession, n: Int, dir: String): Unit = {
    import spark.implicits._
    val r = new Lcg(4242)
    val anchors = Array.fill(10, 64)(r.nextDouble() * 2 - 1)
    val rows = (0 until n).map { i =>
      val label = r.nextInt(10)
      val a = anchors(label)
      val v = Array.tabulate(64)(d => (a(d) * 0.6 + (r.nextDouble() * 2 - 1) * 0.8).toFloat)
      (i.toLong, v, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Synthetic events table in the driver testdata's shape: 30 days of
   *  points over `nUsers` users × 5 metrics, ~2-decimal values. Row
   *  count ∝ nUsers × density so both scale points share distributions. */
  def genEvents(spark: SparkSession, nRows: Int, nUsers: Int, dir: String): Unit = {
    import spark.implicits._
    val r = new Lcg(777)
    val types = Array("click", "error", "purchase", "view", "scroll")
    val base = 1704067200L // 2024-01-01
    val span = 30L * 86400
    val rows = (0 until nRows).map { i =>
      val ts = base + (r.next() % span)
      (i.toLong, new java.sql.Timestamp(ts * 1000L), (r.nextInt(nUsers)).toLong,
        types(r.nextInt(types.length)), (r.nextInt(10000)).toDouble / 100.0,
        s"""{"k": ${r.nextInt(100)}}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Distributed (stateless-hash) documents generator for the 5M-doc
   *  third-decade sweep: the LCG recipe above builds the corpus in a
   *  driver-side buffer, which caps out near the 500k point — here every
   *  field derives from xxhash64(doc_id, salt) so `spark.range`
   *  generates any scale with zero driver memory. Same shape family
   *  (30-word vocab, 16–300 token lengths, planted exact dup every
   *  500th doc and near dup — one token swapped — every 100th), so
   *  wall-ratio probes see the same collision/distribution regime; the
   *  text HOFs run interpreted, which is fine for generation (the
   *  generator is a BUILD step, never measured). */
  def genDocsDistributed(spark: SparkSession, nRows: Long, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val vocabArr = array(Vocab.map(lit): _*)
    val langsArr = array(Langs.map(lit): _*)
    // dup plants copy the PREVIOUS doc's recipe (base id), near dups
    // then swap one hash-picked position for a hash-picked token
    val base = when(col("id") % 500 === 499 || col("id") % 100 === 99,
      col("id") - 1).otherwise(col("id"))
    val len = (lit(16) + pmod(xxhash64(base, lit(1)), lit(285L))).cast("int")
    val swapPos = pmod(xxhash64(col("id"), lit(7)), len.cast("long")) + 1
    val isNear = col("id") % 100 === 99 && !(col("id") % 500 === 499)
    val toks = transform(sequence(lit(1), len), i =>
      when(isNear && i === swapPos.cast("int"),
        element_at(vocabArr, (pmod(xxhash64(col("id"), lit(8)), lit(30L)) + 1).cast("int")))
      .otherwise(
        element_at(vocabArr, (pmod(xxhash64(base, i.cast("long") + lit(100L)), lit(30L)) + 1).cast("int"))))
    spark.range(nRows).select(
        col("id").as("doc_id"),
        array_join(toks, " ").as("text"),
        element_at(langsArr, (pmod(xxhash64(col("id"), lit(2)), lit(7L)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(3)), lit(10L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Distributed documents generator with a REALISTIC vocabulary: ~10k
   *  distinct tokens, log-uniform rank sampling (≈ Zipf(1) — rank =
   *  floor(V^u) puts equal probability mass in each rank decade, the
   *  natural-text shape). Same planted-dup structure and length
   *  distribution as [[genDocsDistributed]], so the ONLY variable vs the
   *  30-word corpus is vocabulary breadth — the factor the SCALE3
   *  super-linear attributions blame for chance shingle collisions. */
  def genDocsZipfDistributed(spark: SparkSession, nRows: Long, dir: String,
      vocabSize: Int = 10000): Unit = {
    import org.apache.spark.sql.functions._
    val langsArr = array(Langs.map(lit): _*)
    val base = when(col("id") % 500 === 499 || col("id") % 100 === 99,
      col("id") - 1).otherwise(col("id"))
    val len = (lit(16) + pmod(xxhash64(base, lit(1)), lit(285L))).cast("int")
    val swapPos = pmod(xxhash64(col("id"), lit(7)), len.cast("long")) + 1
    val isNear = col("id") % 100 === 99 && !(col("id") % 500 === 499)
    def zipfTok(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val u = pmod(xxhash64(seed), lit(1000000L)).cast("double") / 1e6
      concat(lit("w"), floor(pow(lit(vocabSize.toDouble), u)).cast("long"))
    }
    val toks = transform(sequence(lit(1), len), i =>
      when(isNear && i === swapPos.cast("int"),
        zipfTok(struct(col("id"), lit(8), i)))
      .otherwise(zipfTok(struct(base, lit(100), i))))
    spark.range(nRows).select(
        col("id").as("doc_id"),
        array_join(toks, " ").as("text"),
        element_at(langsArr, (pmod(xxhash64(col("id"), lit(2)), lit(7L)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(3)), lit(10L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Realistic-vocabulary + streamed-serving mode (`--zipf`, writes
   *  BENCH_SCALE_ZIPF.json): one decade pair (50k / 500k docs) over the
   *  [[genDocsZipfDistributed]] corpus, measuring
   *   1. the two SCALE3 rows whose super-linearity was ATTRIBUTED to the
   *      degenerate 30-word probe vocabulary (q_dedup_ngram,
   *      q_dedup_minhash_eval): with a 10k-word Zipf vocabulary, chance
   *      band collisions should collapse and both rows should read
   *      near-linear — the attribution's falsifiable prediction;
   *   2. the round-10 streamed serving paths that had no scale rows:
   *      the drift count-log READ over a 100-micro-batch ingest-
   *      maintained log (log length grows with batch COUNT, not data —
   *      the compaction question), and the near-dup admission ingest
   *      (per-batch band join against the stored prior-snapshot index)
   *      plus its admitted-lake read. Streaming builds are timed once
   *      per point (no warm run) — wall ratios carry ingest variance,
   *      which the artifact notes. */
  private def mainZipf(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--zipf")
    val out = rest.headOption.getOrElse("BENCH_SCALE_ZIPF.json")
    val only = rest.drop(1).toSet
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe-zipf").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("GRAFT_SCALE_ZIPF_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale_zipf").toString)
    val ns = Seq(50000L, 500000L)
    val dirs = ns.map(n => s"$base/z$n")
    ns.zip(dirs).withFilter { case (_, d) =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/documents.parquet"))
    }.foreach { case (n, d) => genDocsZipfDistributed(spark, n, d) }
    import org.apache.spark.sql.functions._

    val results = new scala.collection.mutable.LinkedHashMap[String, (Seq[Double], Seq[Long])]
    def record(name: String, measured: Seq[(Double, Long)]): Unit = {
      results(name) = (measured.map(_._1), measured.map(_._2))
      val (s2, r2) = (measured.map(_._1), measured.map(_._2))
      val ratio = s2(1) / math.max(s2(0), 1e-9)
      println(f"$name%-28s ${s2.map(x => f"$x%8.2f").mkString(" ")}s ratio=$ratio%6.2f rows=${r2.mkString("/")}")
    }

    // 1. the batch attribution rows (warm like the other modes)
    val queries = SparkEntry.queries ++ ProbeOnly
    for (q <- Seq("q_dedup_ngram", "q_dedup_minhash_eval")
         if only.isEmpty || only.contains(q)) {
      queries(q)(spark, dirs.head).count()
      spark.catalog.clearCache()
      record(q, dirs.map { d =>
        val m = time(queries(q)(spark, d).count()); spark.catalog.clearCache(); m
      })
    }

    // 2. streamed drift: 100-batch ingest-maintained count log per point,
    // then the production read (sum the log → JSD drift)
    if (only.isEmpty || only.exists(_.startsWith("p_stream_drift"))) {
      val built = dirs.map { d =>
        val b = java.nio.file.Files.createTempDirectory("graft_zipf_drift").toString
        val all = spark.read.parquet(s"$d/documents.parquet")
        all.repartition(100).write.parquet(s"$b/src")
        val ing = time {
          graft.streaming.DocIngest.runTokenCounts(spark, s"$b/src", s"$b/lake",
            s"$b/ckpt", all.schema, maxFilesPerTrigger = Some(1)).awaitTermination()
          spark.read.parquet(s"$b/lake").count()
        }
        (s"$b/lake", ing)
      }
      record("p_stream_drift_ingest100", built.map(_._2))
      def readDrift(lake: String) = time {
        graft.pipeline.TextAnalysis.unigramDriftFromCounts(
          spark.read.parquet(lake)
            .groupBy(col("source"), col("tk")).agg(sum(col("__c")).as("__c")),
          24).count()
      }
      built.foreach(b => readDrift(b._1)) // warm
      record("p_stream_drift_read", built.map(b => readDrift(b._1)))
    }

    // 3. streamed near-dup admission: 10 micro-batches of the crawl
    // third band-joined per batch against the even-half prior snapshot's
    // stored index; read = the admitted lake scan
    if (only.isEmpty || only.exists(_.startsWith("p_stream_near"))) {
      val built = dirs.map { d =>
        val b = java.nio.file.Files.createTempDirectory("graft_zipf_near").toString
        val all = spark.read.parquet(s"$d/documents.parquet")
        all.filter(col("doc_id") % 3 === 0).repartition(10).write.parquet(s"$b/src")
        val ing = time {
          graft.streaming.DocIngest.runPipelineNearDedup(spark, s"$b/src",
            s"$b/lake", s"$b/ckpt", s"$b/work", all.schema,
            all.filter(col("doc_id") % 2 === 0), 0.5,
            maxFilesPerTrigger = Some(1)).awaitTermination()
          spark.read.parquet(s"$b/lake").count()
        }
        (s"$b/lake", ing)
      }
      record("p_stream_near_ingest10", built.map(_._2))
      built.foreach(b => spark.read.parquet(b._1).count()) // warm
      record("p_stream_near_read",
        built.map(b => time(spark.read.parquet(b._1).select("doc_id").count())))
    }

    val sb = new StringBuilder
    sb ++= "{\"docs\": [" + ns.mkString(", ") + "], \"queries\": {"
    sb ++= results.iterator.map { case (q, (secs, rows)) =>
      val ratio = secs(1) / math.max(secs(0), 1e-9)
      f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "ratio": $ratio%.2f}"""
    }.mkString(",")
    sb ++= "\n}, \"notes\": {" +
      "\"vocab\": \"10k-token log-uniform (Zipf-like) vocabulary vs the degenerate 30-word SCALE3 corpus; same planted-dup structure and lengths\", " +
      "\"p_stream_drift_read\": \"reads a 100-micro-batch count log at BOTH points: log length scales with batches x distinct-(source,token)-per-batch, not raw data - the read is one sum aggregate over the log plus the constant-head JSD\", " +
      "\"ingest rows\": \"streaming builds timed once per point (no warm run); ratios carry ingest variance\"}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** Distributed (stateless-hash) events generator for the TSDB
   *  three-point mode: the sequential-LCG recipe above holds every row
   *  on the driver, which caps out near the 1M-row point — here each
   *  row's fields derive from xxhash64(id, salt), so `spark.range`
   *  generates any scale with zero driver memory. Same schema and
   *  distributions (30-day uniform span, 5 metrics, 2-decimal values,
   *  users ∝ scale) — a different seed recipe than the LCG tables,
   *  which is irrelevant for wall-ratio probes. */
  def genEventsDistributed(spark: SparkSession, nRows: Long, nUsers: Int,
      dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val base = 1704067200L
    val span = 30L * 86400
    val types = Array("click", "error", "purchase", "view", "scroll")
    spark.range(nRows).select(
        col("id").as("event_id"),
        timestamp_seconds(lit(base) + pmod(xxhash64(col("id"), lit(1)), lit(span)))
          .as("ts"),
        pmod(xxhash64(col("id"), lit(2)), lit(nUsers.toLong)).as("user_id"),
        element_at(
          array(types.map(lit): _*),
          (pmod(xxhash64(col("id"), lit(3)), lit(5L)) + 1).cast("int")).as("event_type"),
        (pmod(xxhash64(col("id"), lit(4)), lit(10000L)).cast("double") / 100.0).as("value"),
        concat(lit("""{"k": """), pmod(xxhash64(col("id"), lit(5)), lit(100L)),
          lit("}")).as("props"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** The TSDB/events rows probed across TWO decades (100k / 1M / 10M
   *  event rows) in `--tsdb-xl` mode — the downsample / group-by / rate
   *  / analytics / events-analytics family whose 100 TB story is "one
   *  or two map-side-combining aggregates, linear in fact rows". */
  private val TsdbXlProbed: Seq[String] = Seq(
    "q_ds_sum", "q_ds_avg", "q_ds_last", "q_rate", "q_groupby",
    "q_groupby_all", "q_groupby_p95", "q_latest", "q_stale_series",
    "q_ds_ewma", "q_ds_timediff", "q_ds_movavg_simple", "q_anomaly_zscore",
    "q_events_sessions", "q_events_funnel", "q_events_retention",
    "q_filter_semijoin", "q_meta_basic",
    // real-value fill (round 10): the dense grid is |series| × |buckets|
    // — AGGREGATED scale — and the neighbour window partitions per
    // series, so growth should track the downsample prefix (fact-linear)
    "q_ds_fill_prefer", "q_ds_fill_lerp",
    // round 10: interpolated cross-series aggregation (grid stages are
    // aggregated-scale above the downsample) and the deterministic
    // hash-sampled percentile (same fact-scan HashAggregate as any
    // downsample — the sample filter is a per-row projection)
    "q_groupby_lerp", "q_ds_p95_sampled",
    // round 10: the rollup serving paths that moved beyond moments —
    // dev from stored sumsq, percentile from the stored hash sample
    // (each row pays rollup BUILD + serve; the serve itself is
    // rollup-table-sized)
    "q_rollup_dev", "q_rollup_p95_sampled",
    // round 10: the stored cumulative-counter read path — the row pays
    // harness SOURCE BUILD (one fact-sized aggregate + one window over
    // (user,day,ts) rows) + the run() read (downsample `last` +
    // group-by + pick over counter-series rows); expect fact-linear,
    // window-sort dominated
    "q_bucket_quantile_cum_stored",
    // the production meta/latest READ paths: q_meta_basic and q_latest
    // above derive series_dim/latest from the raw fact scan (an honest
    // batch fallback, but not what a deployment serves) — these two read
    // the ingest-MAINTAINED tables, whose cost is dim-sized, not
    // fact-sized. Their lakes are built OUTSIDE the timed region below.
    "q_stream_series_dim", "q_stream_latest",
    // round 11: the timezone calendar downsample — same plan shape as
    // q_ds_sum with the zone CASEs as pure projection arithmetic, so its
    // decades must track q_ds_sum; p_ds_tz_multiyear widens the range to
    // 5 years (~11 offset segments → ~21-branch literal CASE) to show
    // the codegen'd chain stays immaterial as segments accumulate
    "q_ds_tz", "p_ds_tz_multiyear",
    // round 11: the tz compositions — zone-aware fill grid (literal
    // label array over the same one-pass grid build), tz group-by
    // (labels feed the spatial stage unchanged), and the tz hybrid
    // rollup∪raw split (pays rollup BUILD + both serve sides)
    "q_ds_fill_tz", "q_groupby_tz", "q_rollup_tz_hybrid",
    // round 11: CALENDAR buckets — same plan shape as q_ds_tz with the
    // boundary CASE in place of the offset CASE; p_ds_month_multiyear
    // widens to 5 years (~60 monthly boundaries → a 60-branch literal
    // CASE) to show the chain stays immaterial as boundaries accumulate;
    // the rollup row pays build + the calendar serve
    "q_ds_month_tz", "p_ds_month_multiyear", "q_rollup_month_tz",
    // round 12: the monthly-grid zone-aware fill — q_ds_fill_tz's grid
    // plan over q_ds_month_tz's calendar labels (the driver-enumerated
    // label array is months-sized, smaller than the hourly tz grid's),
    // so its decades must track q_ds_fill_tz
    "q_fill_month_tz",
    // round 11: count-min build+report (fact scan → d·w-bounded
    // exchange + a TakeOrdered top-k; must track the plain fact-agg
    // family) and the maintained-cells read (cell-sum of per-batch
    // partials — dim-scale work, like the other maintained reads)
    "q_meta_cms_users", "q_stream_cms_users",
    // round 11: the DDSketch family — quantile build+walk (fact scan →
    // buckets-bounded exchange + a summary-sized window walk; must
    // track the fact-agg family), the exact-beside-estimate eval (pays
    // BOTH the sketch and an exact sort-based percentile by
    // construction), and the maintained-buckets read (bucket-sum of
    // per-batch partials — summary-scale, like the other maintained
    // reads)
    "q_dds_quantiles", "q_dds_eval", "q_stream_dds_q",
    // the dashboard grain: per-(metric, day) p99 — build is the same
    // fact scan with more (still summary-bounded) groups; the streamed
    // read serves from the maintained per-day store
    "q_dds_daily", "q_stream_dds_daily", "q_stream_dds_range",
    // round 11: MAD robust anomaly — two whole-partition window
    // aggregates over one (series, slot) partitioning; its decades must
    // track q_anomaly_zscore's shape (p_anomaly_mad_joins is the
    // rejected join-back formulation, kept for the interleaved A/B)
    "q_anomaly_mad", "p_anomaly_mad_joins",
    // round 11: the transition matrix — one per-entity window (the
    // sessionize shape) + a |types|²-keyed count; must track
    // q_events_sessions
    "q_events_transitions",
    // round 12: the TRANSPARENT SQL rollup serve — plain SQL rewritten
    // by the RollupRouting optimizer rule to scan the persisted 1h
    // composite (store build excluded below, like the other maintained
    // reads). The read is store-sized (~|series|×hours rows), so its
    // decades must stay FLAT-ish while q_ds_sum (the same SQL's raw
    // cost) grows with the fact table — the whole point of the rule
    "q_sql_rollup_routed",
    // round 11: KMV set algebra over the series dim — the bottom-k
    // WindowGroupLimit bounds the exchange at k rows per metric per
    // partition; the gate row pays TWO fact-sized dim builds (sketch +
    // exact eval side), so the production-path row beside it isolates
    // the single-build cost
    "q_meta_kmv_setops", "p_kmv_setops_prod")

  /** The rows whose source is the streaming-ingest-maintained lake: the
   *  one-time ingest is a BUILD step (like corpus generation), excluded
   *  from timing — the probe measures the production read. */
  private val TsdbXlMaintained: Set[String] =
    Set("q_stream_series_dim", "q_stream_latest", "q_stream_cms_users",
      "q_stream_dds_q", "q_stream_dds_daily", "q_stream_dds_range",
      "q_sql_rollup_routed")

  /** TSDB three-point mode: `runMain graft.ScaleProbe --tsdb-xl [out]`.
   *  Writes BENCH_SCALE_TSDB.json. */
  private def mainTsdbXl(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--tsdb-xl")
    val out = rest.headOption.getOrElse("BENCH_SCALE_TSDB.json")
    val only = rest.drop(1).toSet
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe-tsdb").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_SCALE_TSDB_DIR reuses a previous run's generated events (the
    // generator is deterministic) — targeted row refreshes skip the
    // multi-minute generation, like the --xl/--xl4 modes
    val base = sys.env.getOrElse("GRAFT_SCALE_TSDB_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale_tsdb").toString)
    val ns = Seq(100000L, 1000000L, 10000000L)
    val dirs = ns.map(n => s"$base/n$n")
    ns.zip(dirs).withFilter { case (_, d) =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet"))
    }.foreach { case (n, d) =>
      genEventsDistributed(spark, n, (n / 666).toInt.max(150), d)
    }
    val queries = SparkEntry.queries ++ ProbeOnly
    // pre-build the ingest-maintained lakes at every scale point before
    // any timing starts (StreamQueries caches one lake per source dir,
    // so the timed runs below read the maintained tables only)
    if (TsdbXlMaintained.exists(q => only.isEmpty || only.contains(q))) {
      for (d <- dirs) {
        queries("q_stream_series_dim")(spark, d).count()
        graft.queries.RollupQueries.warmBuilds(spark, d)
      }
      spark.catalog.clearCache()
    }
    val sb = new StringBuilder
    sb ++= "{\"events\": [" + ns.mkString(", ") + "], \"queries\": {"
    var first = true
    for (q <- TsdbXlProbed if queries.contains(q) && (only.isEmpty || only.contains(q))) {
      queries(q)(spark, dirs.head).count() // warm (JIT + listing)
      spark.catalog.clearCache()
      val measured = dirs.map { d =>
        val m = time(queries(q)(spark, d).count())
        spark.catalog.clearCache()
        m
      }
      val secs = measured.map(_._1)
      val rows = measured.map(_._2)
      val r10 = secs(1) / math.max(secs(0), 1e-9)
      val r100 = secs(2) / math.max(secs(0), 1e-9)
      val dec2 = secs(2) / math.max(secs(1), 1e-9)
      if (!first) sb ++= ", "
      first = false
      sb ++= f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "r10": $r10%.2f, "r100": $r100%.2f, "decade2": $dec2%.2f}"""
      println(f"$q%-28s ${secs.map(s => f"$s%7.2f").mkString(" ")}s r10=$r10%6.2f r100=$r100%7.2f decade2=$dec2%6.2f rows=${rows.mkString("/")}")
    }
    sb ++= "\n}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** TSDB queries probed against the generated events tables: the
   *  downsample / group-by / rate / latest / filter family (rollup and
   *  streaming rows are covered by their own lake harness, not here). */
  private val TsdbProbed: Seq[String] = Seq(
    "q_ds_sum", "q_ds_avg", "q_ds_minmax", "q_ds_last", "q_ds_median",
    "q_ds_runall", "q_rate", "q_rate_counter", "q_timeshift",
    "q_groupby", "q_groupby_all", "q_latest",
    "q_filter_literal", "q_filter_regex", "q_filter_semijoin",
    "q_meta_metrics", "q_meta_basic", "q_json_full",
    // the post-aggregation analytic nodes: their input is the
    // |series|×|buckets| aggregated frame, so their cost must track the
    // downsample/group-by rows, never the fact rows
    "q_ds_sliding_avg", "q_topn_series", "q_expr_ratio", "q_json_sliding_topn",
    "q_summarizer", "q_expr_percent", "q_ds_ewma", "q_bucket_quantile",
    "q_anomaly_olympic", "q_json_expr",
    "q_ds_timediff", "q_ds_movavg_simple", "q_stale_series",
    // the events-analytics trio reads the raw events table: sessions /
    // funnel / retention are all one-or-two aggregate shapes whose cost
    // must track the event rows linearly
    "q_events_sessions", "q_events_funnel", "q_events_retention",
    "q_events_children", "q_groupby_p95", "q_ds_timediff_daily",
    "q_anomaly_zscore")

  /** The doc/embedding-only queries (TSDB queries need the events table
   *  and are scale-proven by the lake's partition pruning instead). */
  private val Probed: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_incremental", "q_dedup_near", "q_dedup_near_incremental",
    "q_dedup_ngram", "q_dedup_simhash",
    "q_dedup_simhash_near", "q_dedup_simhash_capped", "q_dedup_clusters", "q_dedup_embed",
    "q_dedup_embed_clusters", "q_dedup_hybrid_clusters",
    "q_pipeline_corpus", "q_pipeline_report", "q_pipeline_pack", "q_pipeline_pack_index",
    "q_pipeline_chunks", "q_pipeline_topk_domain", "q_pipeline_decontam",
    // q_stream_doc_pipeline is NOT probed: its first read builds the
    // streamed lake (same reason the TSDB q_stream_* rows are excluded —
    // ingest cost is not a 10×-read-ratio question; the read itself is
    // the trivial parquet scan the other corpus rows already measure)
    "q_pipeline_decontam_clean",
    "q_pipeline_sample", "q_pipeline_sample_stratified", "q_pipeline_budget",
    "q_pipeline_budget_domain", "q_pipeline_split", "q_pipeline_shuffle",
    "q_dedup_spans", "q_dedup_span_removal", "q_pipeline_chunks_strided",
    "q_pipeline_sample_temperature", "q_pipeline_quality_buckets",
    "q_pipeline_sample_weighted",
    "q_text_stats", "q_text_quality", "q_text_langid", "q_text_repetition",
    "q_text_logprob", "q_text_bigram_lm", "q_text_keywords", "q_text_fingerprint", "q_text_pii",
    // round 11: PMI — one unigram-head pass + one restricted bigram agg;
    // everything after the agg is head²-bounded, so decades must track
    // the bigram-LM stats side
    "q_text_pmi",
    "q_ann_brute", "q_ann_buckets", "q_ann_lsh", "q_ann_multiprobe",
    "q_ann_ivf", "q_ann_ivf_probe", "q_ann_kmeans", "q_ann_quantize",
    "q_ann_label_centroids", "q_ann_pq_codes", "q_ann_pq", "q_ann_ivfpq",
    "q_ann_ivfpq_residual", "q_ann_cluster_cap", "q_ann_recall",
    // constant-size eval suite broadcasts; cost must be linear in the
    // corpus side (the whole point of the declared fixed-slice shape)
    "q_pipeline_decontam_semantic",
    // bounded-query-batch BM25 (the annQPred convention); novelty's
    // distinct-build-side left join; cross-label brute (exhaustive by
    // contract, probed for the same documentation the brute row gets)
    "q_text_bm25", "q_pipeline_novelty", "q_ann_hard_negatives",
    "q_pipeline_dsir", "q_pipeline_gopher", "q_pipeline_ccnet",
    "q_text_oov", "q_pipeline_mix", "q_ann_rerank", "q_pipeline_epochs",
    "q_text_fertility",
    "p_dedup_embed_capped", "p_dedup_minhash_capped")

  /** Probe-only rows: the PRODUCTION (capped) dedup variants that are
   *  not declared queries (their declared siblings run cap-off so the
   *  oracle stays exhaustive) — measured here so the "scale path" claims
   *  carry the same 10× evidence as the exhaustive paths. The constant-k
   *  nprobe-IVF production shape needs no extra row: q_ann_ivf_probe IS
   *  that shape since the constant-k restatement. */
  private[graft] val ProbeOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A/B: q_ds_sum with the sort-free hash-aggregate LWW dedupe in
    // place of the window — same rows, no reduce-stage sort
    "p_ds_sum_hashdedup" -> { (s, d) =>
      import graft.query._
      import org.apache.spark.sql.functions.{col, lit}
      val Start = graft.queries.OracleCommon.Start
      val End = graft.queries.OracleCommon.End
      val p = graft.sources.TsdbViews.points(s, d)
        .filter(col("ts") >= lit(Start) && col("ts") < lit(End))
      QueryEngine.downsample(QueryEngine.dedupeAgg(p),
        DownsampleSpec("1d", "sum"), Start, End)
    },
    // A/B: q_anomaly_mad with the groupBy + join-back formulation the
    // operator FIRST shipped as — it references the aggregated lineage
    // three times, so the fact-sized downsample pipeline upstream
    // re-evaluates per reference; the shipped two-window form
    // materializes it once (SeriesAnalytics.robustZscore scaladoc)
    "p_anomaly_mad_joins" -> { (s, d) =>
      import graft.query._
      import org.apache.spark.sql.functions._
      val Start = graft.queries.OracleCommon.DataStart
      val End = Start + 31L * 86400
      val ds = QueryEngine.run(graft.sources.TsdbViews.points(s, d),
        TsdbQuery(graft.filters.MatchAll, Start, End,
          downsample = Some(DownsampleSpec("1d", "count")),
          groupBy = Some(GroupBySpec(Seq("user"), "sum"))))
        .withColumn("value", round(col("value"), 4))
        .withColumn("__slot", expr("(bucket_ts DIV 86400) % 7"))
      val med = ds.groupBy(col("user"), col("__slot"))
        .agg(percentile(col("value"), lit(0.5)).as("__med"))
      val dev = ds.join(med, Seq("user", "__slot"))
        .withColumn("__adev", abs(col("value") - col("__med")))
      val mad = dev.groupBy(col("user"), col("__slot"))
        .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
      dev.join(mad, Seq("user", "__slot"))
        .withColumn("robust_z", when(col("__mad") > 0,
          round((col("value") - col("__med")) / (lit(1.4826) * col("__mad")), 6)))
    },
    // the PRODUCTION KMV set-ops path alone: one series-dim build, one
    // bottom-k walk — q_meta_kmv_setops' gate row additionally joins
    // the exact-count side (a second fact-sized dim build, the eval
    // harness), which is what its in-sweep decades measure
    "p_kmv_setops_prod" -> { (s, d) =>
      import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit}
      val ident = concat_ws("|", col("metric"), col("tags")("user"),
        col("tags")("host"), col("tags")("colo"),
        coalesce(col("tags")("env"), lit("")))
      graft.meta.MetaQueries.sketchSetOps(
        graft.sources.TsdbViews.seriesDim(graft.sources.TsdbViews.points(s, d)),
        graft.filters.TagLiteral("colo", Seq("den")),
        graft.filters.TagLiteral("env", Seq("prod")), ident, k = 32)
    },
    "p_dedup_embed_capped" -> ((s, d) =>
      graft.pipeline.Similarity.nearDuplicateEdgesCapped(
        s.read.parquet(s"$d/embeddings.parquet"), 0.3, maxBucketSize = 100)),
    "p_dedup_minhash_capped" -> ((s, d) =>
      graft.pipeline.Dedup.candidates(
        s.read.parquet(s"$d/documents.parquet"), maxBucketSize = 100)),
    "p_dedup_ngram_capped" -> ((s, d) =>
      graft.pipeline.Dedup.ngramJaccard(
        s.read.parquet(s"$d/documents.parquet"), 0.3, maxBucketSize = 100)),
    // q_ds_tz with a FIVE-YEAR query range (2020-2025): the generated
    // events still span 30 days, so the fact work is identical to
    // q_ds_tz — what grows is the driver-resolved offset-segment CASE
    // (~11 segments → ~21 literal branches in the row+label offsets).
    // Wall must match q_ds_tz's; divergence would mean the literal CASE
    // chain has become a per-row cost.
    "p_ds_tz_multiyear" -> { (s, d) =>
      import graft.query._
      import graft.filters.MatchAll
      QueryEngine.run(graft.sources.TsdbViews.points(s, d),
        TsdbQuery(MatchAll, 1577836800L, 1735689600L,
          downsample = Some(DownsampleSpec("1d", "sum",
            timezone = Some("America/Denver")))))
    },
    // q_ds_month_tz over the same FIVE-YEAR range: fact work identical
    // (the events span 30 days); what grows is the literal boundary
    // CASE (60 monthly boundaries). Wall must match q_ds_month_tz's.
    "p_ds_month_multiyear" -> { (s, d) =>
      import graft.query._
      import graft.filters.MatchAll
      QueryEngine.run(graft.sources.TsdbViews.points(s, d),
        TsdbQuery(MatchAll, 1577836800L, 1735689600L,
          downsample = Some(DownsampleSpec("1n", "sum",
            timezone = Some("America/Denver")))))
    })

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** The production-path family probed at THREE scale points (5k / 50k /
   *  500k docs — two decades): the queries whose 100 TB story is "near-
   *  linear", now with the second decade measured instead of
   *  extrapolated. A linear operator's decade-2 ratio (500k/50k wall)
   *  should sit near its decade-1 ratio (50k/5k); super-linear cost
   *  compounds decade over decade and cannot hide. Exhaustive-by-
   *  contract oracle paths (brute ANN, cap-off near-dup) are excluded —
   *  their scaling regime is documented, not claimed linear. */
  private val XlProbed: Seq[String] = Seq(
    // round 11: token-frequency count-min — fact-linear token explode
    // into a bounded cell grid + a vocab-sized exact evaluation side —
    // and the truncation-recall ablation (|dims|+1 bounded-query corpus
    // scans; must track the brute/recall family's linearity)
    "q_text_cms_tokens", "q_ann_trunc_recall",
    "q_dedup_exact", "q_dedup_incremental", "q_dedup_simhash",
    "q_dedup_simhash_capped", "p_dedup_minhash_capped", "p_dedup_embed_capped",
    "q_dedup_spans", "q_dedup_span_removal",
    "q_pipeline_pack", "q_pipeline_pack_index", "q_pipeline_chunks", "q_pipeline_budget",
    "q_pipeline_budget_domain", "q_pipeline_split", "q_pipeline_shuffle",
    "q_pipeline_quality_buckets", "q_pipeline_sample_temperature",
    "q_pipeline_topk_domain",
    "q_text_langid", "q_text_pii", "q_text_bigram_lm", "q_text_pmi",
    "q_dedup_near_incremental",
    "q_text_bm25", "q_pipeline_novelty", "q_pipeline_dsir", "q_pipeline_gopher",
    "q_ann_ivf_probe", "q_ann_cluster_cap", "q_ann_ivfpq", "q_ann_ivfpq_residual",
    "q_text_oov", "q_pipeline_mix", "q_ann_rerank",
    // round-10 additions: the two heaviest sf0.1 bench rows that had no
    // decade evidence (q_dedup_ngram's verify-stage Jaccard join and the
    // multi-operator corpus report), plus the capped production shape of
    // the verify join (q_dedup_ngram runs cap-off by oracle contract)
    "q_dedup_ngram", "q_pipeline_report", "p_dedup_ngram_capped",
    // round 10: quality-aware cluster representative — same candidate
    // pipeline as q_pipeline_corpus plus one |clusters|-row max_by agg
    "q_pipeline_corpus_best",
    // round 10: estimator-quality evaluation — by construction it pays
    // BOTH the signature pipeline and the exact verify join (it compares
    // them), so its wall tracks q_dedup_ngram's cap-off regime, not the
    // capped production dedup path
    "q_dedup_minhash_eval",
    // round 10: corpus-drift JSD — oov-shaped (one token-occurrence
    // aggregate + constant head cut + broadcast probe), expect linear
    "q_text_drift")

  /** Three-point mode: `runMain graft.ScaleProbe --xl [outJson] [names...]`
   *  (run with SPARK_DRIVER_MEM=24g — the 500k-doc generator briefly
   *  holds the corpus on the driver). Writes BENCH_SCALE3.json. */
  private def mainXl(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--xl")
    val out = rest.headOption.getOrElse("BENCH_SCALE3.json")
    val only = rest.drop(1).toSet
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe-xl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_SCALE3_DIR reuses a previous run's generated corpora (the
    // generator is deterministic, so any complete run's dirs are
    // bit-identical) — targeted row refreshes skip the multi-minute
    // driver-side generation
    val base = sys.env.getOrElse("GRAFT_SCALE3_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale3").toString)
    val ns = Seq(5000, 50000, 500000)
    val dirs = ns.map(n => s"$base/n$n")
    ns.zip(dirs).withFilter { case (_, d) =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/documents.parquet"))
    }.foreach { case (n, d) =>
      genDocs(spark, n, d); genEmbeddings(spark, n * 2 / 5, d)
    }
    val queries = SparkEntry.queries ++ ProbeOnly
    val sb = new StringBuilder
    sb ++= "{\"docs\": [" + ns.mkString(", ") + "], \"queries\": {"
    var first = true
    for (q <- XlProbed if queries.contains(q) && (only.isEmpty || only.contains(q))) {
      queries(q)(spark, dirs.head).count() // warm (JIT + listing)
      spark.catalog.clearCache()
      val measured = dirs.map { d =>
        val m = time(queries(q)(spark, d).count())
        spark.catalog.clearCache()
        m
      }
      val secs = measured.map(_._1)
      val rows = measured.map(_._2)
      val r10 = secs(1) / math.max(secs(0), 1e-9)
      val r100 = secs(2) / math.max(secs(0), 1e-9)
      val dec2 = secs(2) / math.max(secs(1), 1e-9)
      if (!first) sb ++= ", "
      first = false
      sb ++= f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "r10": $r10%.2f, "r100": $r100%.2f, "decade2": $dec2%.2f}"""
      println(f"$q%-28s ${secs.map(s => f"$s%7.2f").mkString(" ")}s r10=$r10%6.2f r100=$r100%7.2f decade2=$dec2%6.2f rows=${rows.mkString("/")}")
    }
    sb ++= "\n}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** Third-decade sweep (`--xl4`, BENCH_SCALE4.json): the steepest rows
   *  from both two-decade artifacts, one decade further — 50k/500k/5M
   *  docs and 1M/10M/100M events, all from the DISTRIBUTED stateless
   *  generators (one recipe per family across all three points). A
   *  linear operator's decade-3 ratio should sit near its decade-2
   *  ratio; super-linear cost compounds and cannot hide at 5M/100M. */
  private def mainXl4(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--xl4")
    val out = rest.headOption.getOrElse("BENCH_SCALE4.json")
    val only = rest.drop(1).toSet
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe-xl4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_SCALE4_DIR reuses a previous run's generated corpora —
    // attribution re-runs measure the same bytes instead of paying the
    // multi-minute generation again
    val base = sys.env.getOrElse("GRAFT_SCALE4_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale4").toString)
    val docNs = Seq(50000L, 500000L, 5000000L)
    val evNs = Seq(1000000L, 10000000L, 100000000L)
    val docDirs = docNs.map(n => s"$base/d$n")
    val evDirs = evNs.map(n => s"$base/e$n")
    def missing(d: String) =
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/documents.parquet")) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet"))
    docNs.zip(docDirs).withFilter(x => missing(x._2))
      .foreach { case (n, d) => genDocsDistributed(spark, n, d) }
    evNs.zip(evDirs).withFilter(x => missing(x._2))
      .foreach { case (n, d) =>
        genEventsDistributed(spark, n, (n / 666).toInt.max(150), d)
      }
    val docProbed = Seq("q_text_bigram_lm", "p_dedup_minhash_capped", "q_pipeline_dsir")
    // round-10 additions: the steep TSDB rows from the two-decade sweep
    // (q_anomaly_zscore decade2 8.99 was the steepest TSDB shape —
    // expanding-history window) plus rate / timeDifference /
    // filter-semijoin, the remaining headline read shapes
    val evProbed = Seq("q_ds_sum", "q_groupby", "q_anomaly_zscore",
      "q_rate", "q_ds_timediff", "q_filter_semijoin",
      // round-10 real-value fill: the grid is aggregated-scale and the
      // neighbour window partitions per series — expect fact-linear
      "q_ds_fill_prefer", "q_ds_fill_lerp")
    val queries = SparkEntry.queries ++ ProbeOnly
    val sb = new StringBuilder
    sb ++= "{\"docs\": [" + docNs.mkString(", ") + "], \"events\": [" +
      evNs.mkString(", ") + "], \"queries\": {"
    var first = true
    def probe(names: Seq[String], dirs: Seq[String]): Unit =
      for (q <- names if queries.contains(q) && (only.isEmpty || only.contains(q))) {
        queries(q)(spark, dirs.head).count() // warm (JIT + listing)
        spark.catalog.clearCache()
        val measured = dirs.map { d =>
          val m = time(queries(q)(spark, d).count())
          spark.catalog.clearCache()
          m
        }
        val secs = measured.map(_._1)
        val rows = measured.map(_._2)
        val d2 = secs(1) / math.max(secs(0), 1e-9)
        val d3 = secs(2) / math.max(secs(1), 1e-9)
        if (!first) sb ++= ", "
        first = false
        sb ++= f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "decade2": $d2%.2f, "decade3": $d3%.2f}"""
        println(f"$q%-28s ${secs.map(s => f"$s%8.2f").mkString(" ")}s decade2=$d2%6.2f decade3=$d3%6.2f rows=${rows.mkString("/")}")
      }
    probe(docProbed, docDirs)
    probe(evProbed, evDirs)
    // round-10 attribution of the round-9 q_ds_sum 10.70 / q_groupby
    // 11.53 decade3 (the first above-linear headline signal): ISOLATED
    // re-measure (graft.ScaleAttr, same corpora) reads 8.5x / 8.6x —
    // sub-linear; the sweep numbers carried suite contamination (the
    // q_text_oov precedent). The only super-linear artifact at 100M is
    // a reduce-stage sort spill (~13 GB mem / ~1 GB disk in the dedupe
    // window sort + final agg) from 32 fixed partitions x one fixed-heap
    // JVM; A/B showed neither 256 initial partitions (spill moves to the
    // map stage — total heap is the constraint, not partition count) nor
    // 24g heap (spill persists, wall unchanged: scan/projection
    // dominates task-time) moves the wall. A cluster holds per-task
    // share constant by scaling executors with data — single-JVM
    // artifact, not a plan defect.
    sb ++= "\n}, \"notes\": {" +
      "\"q_ds_sum\": \"round-10 attribution: isolated decade3 8.5 (ScaleAttr; in-sweep values carry suite contamination); 100M reduce-stage sort spill ~13GB mem is a single-JVM artifact - partition-count and heap A/Bs left the wall unchanged, scan dominates task-time; 300M ceiling probe (24g, isolated): 50.5 -> 154.8 s = 3.06x for 3x data, still linear, spill grows proportionally - the external sort degrades gracefully rather than walling\", " +
      "\"q_groupby\": \"same attribution as q_ds_sum: isolated decade3 8.6\", " +
      "\"q_filter_semijoin\": \"isolated decade3 8.97 (6.68 -> 59.91 s, ScaleAttr) - the in-sweep 18.21 is page-cache contamination; two fact scans dominate (dim derivation + semi-join probe), zero spill\", " +
      "\"q_anomaly_zscore\": \"isolated decade3 10.4 (5.79 -> 60.01 s); carries the same reduce-stage sort spill as q_ds_sum (~14GB mem) - the expanding-history window itself is over <=30 buckets/series and immaterial\", " +
      "\"q_rate\": \"isolated decade3 9.5 (3.65 -> 34.68 s), no spill\", " +
      "\"q_ds_timediff\": \"isolated decade3 9.6 (3.96 -> 37.94 s), no spill\"}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** Batch-COUNT axis mode (`--batches`, writes BENCH_SCALE_BATCH.json):
   *  the one scale axis the TSDB/ZIPF rows never vary. DATA is held
   *  constant (sf0.1: 100k events, 5k docs) while the number of
   *  micro-batches the ingest-maintained count stores accumulate spans
   *  one decade (10 vs 100 `batch_id=N` partitions — 100 batches ≈ 1.7 h
   *  of a 1-min production trigger cadence). For each store the probe
   *  measures the merged production read UNCOMPACTED at both points
   *  (cost grows with partition/file count: the listing + small-file
   *  open tax the per-batch-partial design pays), then runs
   *  [[graft.streaming.StoreCompaction]] and re-measures (expected flat
   *  and decade-independent: ≤ 2 partitions remain regardless of batch
   *  count), plus the compaction pass itself (bounded: a sum-by-key
   *  rewrite of summary-sized relations). Stores probed: count-min
   *  cells, DDSketch buckets at BOTH grains (per-metric + per-metric×day
   *  — the q_stream_dds_daily serving config), and the PMI unigram+pair
   *  count stores (the DocIngest shape; the drift token-count store
   *  shares it and already has its own 100-batch flat-read row in
   *  BENCH_SCALE_ZIPF). Ingest builds are timed once per point (no warm
   *  run) — their ratios carry streaming variance, noted in the
   *  artifact. `GRAFT_BATCH_SF_DIR` overrides the source sf dir. */
  private def mainBatches(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--batches")
    val out = rest.headOption.getOrElse("BENCH_SCALE_BATCH.json")
    val only = rest.drop(1).toSet
    def on(n: String) = only.isEmpty || only.contains(n)
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe-batches").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val sf = sys.env.getOrElse("GRAFT_BATCH_SF_DIR", "/root/testdata/sf0.1")
    val bs = Seq(10, 100)

    val results = new scala.collection.mutable.LinkedHashMap[String, (Seq[Double], Seq[Long])]
    def record(name: String, measured: Seq[(Double, Long)]): Unit = {
      results(name) = (measured.map(_._1), measured.map(_._2))
      val (s2, r2) = (measured.map(_._1), measured.map(_._2))
      val ratio = s2(1) / math.max(s2(0), 1e-9)
      println(f"$name%-32s ${s2.map(x => f"$x%8.2f").mkString(" ")}s ratio=$ratio%6.2f rows=${r2.mkString("/")}")
    }
    // the read rows are the axis evidence: warm once, then time (the
    // zipf-mode convention; listing + open cost is what's measured and
    // it re-pays on every read — only JVM/codegen warmup is absorbed)
    def readRow[C](name: String, mk: C => DataFrame, points: Seq[C]): Unit =
      if (on(name)) {
        points.foreach(c => mk(c).count()) // warm
        record(name, points.map(c => time(mk(c).count())))
      }

    import graft.streaming.{DocIngest, IngestJob, StoreCompaction}
    import graft.queries.TsdbQueries

    // 1. the IngestJob-maintained sketch stores over the events table
    if (only.isEmpty || only.exists(n => n.contains("cms") || n.contains("dds") || n.contains("sketch"))) {
      val events = spark.read.parquet(s"$sf/events.parquet")
      val built = bs.map { b =>
        val base = java.nio.file.Files.createTempDirectory(s"graft_batch_sk$b").toString
        events.repartition(b).write.parquet(s"$base/src")
        val cfg = IngestJob.Config(s"$base/lake", s"$base/ckpt",
          retentionSec = Long.MaxValue / 4, maxFutureSec = Long.MaxValue / 4,
          cms = Some(IngestJob.CmsConfig("tags['user']", depth = 4, width = 512)),
          dds = Seq(IngestJob.DdsConfig("metric", "value", TsdbQueries.DdsAlpha),
            IngestJob.DdsConfig(TsdbQueries.DdsDailyKeyExpr, "value",
              TsdbQueries.DdsAlpha, name = "dds_daily")))
        val ing = time {
          IngestJob.run(spark, s"$base/src", cfg, maxFilesPerTrigger = Some(1))
            .awaitTermination()
          spark.read.parquet(IngestJob.cmsPath(cfg)).count()
        }
        (cfg, ing)
      }
      record("p_batch_sketch_ingest", built.map(_._2))
      val cfgs = built.map(_._1)
      def cmsRead(c: IngestJob.Config) = IngestJob.cmsCells(spark, c)
      def ddsRead(c: IngestJob.Config) = graft.operators.QuantileSketch
        .quantiles(IngestJob.ddsBuckets(spark, c), Seq(0.5, 0.9, 0.99), TsdbQueries.DdsAlpha)
      def dailyRead(c: IngestJob.Config) = graft.operators.QuantileSketch
        .quantiles(IngestJob.ddsBuckets(spark, c, "dds_daily"), Seq(0.99), TsdbQueries.DdsAlpha)
      readRow("p_batch_cms_read", cmsRead, cfgs)
      readRow("p_batch_dds_read", ddsRead, cfgs)
      readRow("p_batch_dds_daily_read", dailyRead, cfgs)
      if (on("p_batch_compact_sketches"))
        record("p_batch_compact_sketches", cfgs.map { c =>
          time { StoreCompaction.compactSketches(spark, c)
            spark.read.parquet(IngestJob.cmsPath(c)).count() }
        })
      else cfgs.foreach(c => StoreCompaction.compactSketches(spark, c))
      readRow("p_batch_cms_read_compacted", cmsRead, cfgs)
      readRow("p_batch_dds_read_compacted", ddsRead, cfgs)
      readRow("p_batch_dds_daily_read_compacted", dailyRead, cfgs)
    }

    // 1b. the IN-BAND maintenance overhead: the identical sketch ingest
    // with compactEvery = 10 — what running the fold inside the hot
    // foreachBatch path costs vs the offline-pass baseline above (the
    // post-ingest stores are already near-folded, so the reads ride the
    // compacted shape; the baseline's *_read_compacted rows cover them)
    if (only.isEmpty || only.exists(_.contains("inband"))) {
      val events = spark.read.parquet(s"$sf/events.parquet")
      val built = bs.map { b =>
        val base = java.nio.file.Files.createTempDirectory(s"graft_batch_ib$b").toString
        events.repartition(b).write.parquet(s"$base/src")
        val cfg = IngestJob.Config(s"$base/lake", s"$base/ckpt",
          retentionSec = Long.MaxValue / 4, maxFutureSec = Long.MaxValue / 4,
          cms = Some(IngestJob.CmsConfig("tags['user']", depth = 4, width = 512)),
          dds = Seq(IngestJob.DdsConfig("metric", "value", TsdbQueries.DdsAlpha),
            IngestJob.DdsConfig(TsdbQueries.DdsDailyKeyExpr, "value",
              TsdbQueries.DdsAlpha, name = "dds_daily")),
          compactEvery = Some(10))
        time {
          IngestJob.run(spark, s"$base/src", cfg, maxFilesPerTrigger = Some(1))
            .awaitTermination()
          spark.read.parquet(IngestJob.cmsPath(cfg)).count()
        }
      }
      record("p_batch_sketch_ingest_inband", built)
    }

    // 2. the DocIngest-maintained PMI unigram+pair count stores
    if (only.isEmpty || only.exists(_.contains("pmi"))) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val built = bs.map { b =>
        val base = java.nio.file.Files.createTempDirectory(s"graft_batch_pmi$b").toString
        docs.repartition(b).write.parquet(s"$base/src")
        val ing = time {
          DocIngest.runPairCounts(spark, s"$base/src", s"$base/lake",
            s"$base/ckpt", docs.schema, maxFilesPerTrigger = Some(1))
            .awaitTermination()
          spark.read.parquet(s"$base/lake/bg").count()
        }
        (s"$base/lake", ing)
      }
      record("p_batch_pmi_ingest", built.map(_._2))
      val lakes = built.map(_._1)
      def pmiRead(lake: String) = graft.pipeline.TextAnalysis.pmiFromCounts(
        spark.read.parquet(s"$lake/uni"), spark.read.parquet(s"$lake/bg"),
        minCount = 5, k = 40, headVocab = 2048)
      readRow("p_batch_pmi_read", pmiRead, lakes)
      if (on("p_batch_compact_pmi"))
        record("p_batch_compact_pmi", lakes.map { l =>
          time { StoreCompaction.compactCounts(spark, s"$l/uni", Seq("tk"))
            StoreCompaction.compactCounts(spark, s"$l/bg", Seq("w1", "w2"))
            spark.read.parquet(s"$l/bg").count() }
        })
      else lakes.foreach { l =>
        StoreCompaction.compactCounts(spark, s"$l/uni", Seq("tk"))
        StoreCompaction.compactCounts(spark, s"$l/bg", Seq("w1", "w2")): Unit
      }
      readRow("p_batch_pmi_read_compacted", pmiRead, lakes)
    }

    val sb = new StringBuilder
    sb ++= "{\"batches\": [" + bs.mkString(", ") + "], \"queries\": {"
    sb ++= results.iterator.map { case (q, (secs, rows)) =>
      val ratio = secs(1) / math.max(secs(0), 1e-9)
      f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "ratio": $ratio%.2f}"""
    }.mkString(",")
    sb ++= "\n}, \"notes\": {" +
      "\"axis\": \"batch COUNT, data constant (sf0.1: 100k events, 5k docs) - 10 vs 100 batch_id partitions per maintained store; 100 batches = 1.7h of a 1-min production trigger\", " +
      "\"reads\": \"merged production read per store; uncompacted cost is the per-batch-partial listing + small-file tax, compacted re-read has <= 2 partitions at either point and should be decade-FLAT\", " +
      "\"compaction\": \"StoreCompaction fold (sum-by-key rewrite of a summary-sized relation, max batch_id excluded for replay safety), timed per point\", " +
      "\"p_batch_sketch_ingest_inband\": \"the identical sketch ingest with compactEvery=10 (the fold runs INSIDE foreachBatch every 10th batch) vs p_batch_sketch_ingest's offline-pass baseline - the in-band maintenance overhead on the hot path\", " +
      "\"ingest rows\": \"streaming builds timed once per point (no warm run); ratios carry ingest + per-trigger overhead variance\", " +
      "\"drift store\": \"the DocIngest token-count store shares the PMI stores' shape; its own 100-batch flat-read row is BENCH_SCALE_ZIPF p_stream_drift_read\"}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** SYNTHETIC batch-count probe (`--batches-synth`, writes
   *  BENCH_SCALE_BATCH_SYNTH.json — round 13, verdict #7): the real
   *  streaming decade in [[mainBatches]] is ingest-bound (~11 min for
   *  100 batches), so a full production DAY (~1,440 one-minute
   *  triggers) is probed by SYNTHESIZING the partials instead.
   *  Legitimate because counts-are-sums: any decomposition of a store's
   *  counts into non-negative summands is a valid partial history — the
   *  merged read is bit-identical by construction, and the READ cost
   *  under test (partition listing + small-file opens, linear in batch
   *  count) depends only on the file layout, not on which summand went
   *  where. Each count c splits into min(c, B) single-unit-or-more
   *  partials (batch k gets c div B + 1 more while k < c mod B; zero
   *  rows are dropped, matching real batches that only write touched
   *  keys). Stores probed at 100 vs 1,000 partials: count-min cells,
   *  the day-keyed DDSketch grain, and the PMI unigram+pair counts —
   *  merged read, timed fold, folded re-read (expected decade-FLAT:
   *  ≤ 2 partitions remain at either point). */
  private def mainBatchesSynth(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--batches-synth")
    val out = rest.headOption.getOrElse("BENCH_SCALE_BATCH_SYNTH.json")
    val spark = graft.core.GraftSession.builder()
      .appName("graft-scale-probe-batches-synth").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.streaming.StoreCompaction
    import graft.queries.TsdbQueries
    val sf = sys.env.getOrElse("GRAFT_BATCH_SF_DIR", "/root/testdata/sf0.1")
    val bs = Seq(100, 1000)

    /** Split `df`'s `cntCol` into `b` equal-sum partials, one
     *  `batch_id=k` partition each (empty summands dropped). Each key's
     *  units start at a per-key hashed batch offset, so keys whose count
     *  is below `b` still fill DIFFERENT partitions — without the
     *  offset, small counts would all land in the low batch ids and the
     *  written partition count (the listing axis under test) would cap
     *  at the store's max cell count. */
    def synth(df: DataFrame, cntCol: String, dir: String, b: Int): Unit = {
      val ids = spark.range(b).select(col("id").as("batch_id"))
      val keyCols = df.columns.filterNot(_ == cntCol).map(col)
      df.crossJoin(broadcast(ids))
        .withColumn(cntCol,
          floor(col(cntCol) / b).cast("long") +
            when(col("batch_id") < col(cntCol) % b, 1L).otherwise(0L))
        .filter(col(cntCol) > 0)
        .withColumn("batch_id",
          pmod(col("batch_id") + abs(hash(keyCols: _*)), lit(b.toLong)))
        .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    }
    def partitions(dir: String): Long =
      Option(new java.io.File(dir).listFiles()).map(
        _.count(f => f.isDirectory && f.getName.startsWith("batch_id=")).toLong)
        .getOrElse(0L)

    val results = new scala.collection.mutable.LinkedHashMap[String, (Seq[Double], Seq[Long])]
    def record(name: String, measured: Seq[(Double, Long)]): Unit = {
      results(name) = (measured.map(_._1), measured.map(_._2))
      val s2 = measured.map(_._1)
      val ratio = s2(1) / math.max(s2(0), 1e-9)
      println(f"$name%-32s ${s2.map(x => f"$x%8.2f").mkString(" ")}s ratio=$ratio%6.2f rows=${measured.map(_._2).mkString("/")}")
    }
    /** Materialize EVERY column through a checksum aggregate: under a
     *  bare count() column pruning can drop the cnt/__c columns from the
     *  parquet scans and understate the byte-read side of the timing
     *  (the round-12 lesson about count()-based probes); hashing all
     *  columns makes the scan unprunable while returning the row count
     *  for the rows axis. */
    def force(df: DataFrame): Long =
      df.select(hash(df.columns.map(col): _*).as("__h"))
        .agg(count(lit(1)).as("__n"), sum(col("__h"))).head.getLong(0)
    def readRow(name: String, mk: String => DataFrame, dirs: Seq[String]): Unit = {
      dirs.foreach(d => force(mk(d))) // warm (JVM/codegen only; listing re-pays)
      record(name, dirs.map(d => time(force(mk(d)))))
    }

    val base = java.nio.file.Files.createTempDirectory("graft_batch_synth").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val partCounts = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]

    // count-min cells (the IngestJob store schema: i, j, cnt)
    val cmsOneShot = graft.operators.CountMin.sketch(
      graft.sources.TsdbViews.pointsFromEvents(events), expr("tags['user']"), 4, 512)
    val cmsDirs = bs.map { b => val d = s"$base/cms$b"; synth(cmsOneShot, "cnt", d, b); d }
    partCounts("cms") = cmsDirs.map(partitions)
    def cmsRead(d: String) =
      graft.operators.CountMin.merge(StoreCompaction.read(spark, d))
    readRow("p_synth_cms_read", cmsRead, cmsDirs)
    record("p_synth_cms_fold", cmsDirs.map(d => time {
      StoreCompaction.compactBatchStore(spark, d, graft.operators.CountMin.merge)
      partitions(d)
    }))
    readRow("p_synth_cms_read_compacted", cmsRead, cmsDirs)

    // the day-keyed DDSketch grain (key, sgn, idx, cnt)
    val pts = graft.sources.TsdbViews.pointsFromEvents(events)
    val ddsOneShot = graft.operators.QuantileSketch.sketch(pts,
      expr(TsdbQueries.DdsDailyKeyExpr), col("value"), TsdbQueries.DdsAlpha)
    val ddsDirs = bs.map { b => val d = s"$base/dds$b"; synth(ddsOneShot, "cnt", d, b); d }
    partCounts("dds_daily") = ddsDirs.map(partitions)
    def ddsRead(d: String) = graft.operators.QuantileSketch.quantiles(
      graft.operators.QuantileSketch.merge(StoreCompaction.read(spark, d)),
      Seq(0.99), TsdbQueries.DdsAlpha)
    readRow("p_synth_dds_daily_read", ddsRead, ddsDirs)
    record("p_synth_dds_daily_fold", ddsDirs.map(d => time {
      StoreCompaction.compactBatchStore(spark, d, graft.operators.QuantileSketch.merge)
      partitions(d)
    }))
    readRow("p_synth_dds_daily_read_compacted", ddsRead, ddsDirs)

    // the PMI unigram + pair count stores (tk,__c / w1,w2,__c)
    val uniOneShot = graft.pipeline.TextAnalysis.unigramCounts(docs) // (tk, __c)
    val bgOneShot = graft.pipeline.TextAnalysis.bigramCounts(docs) // (w1, w2, __c)
    val pmiLakes = bs.map { b =>
      val l = s"$base/pmi$b"
      synth(uniOneShot, "__c", s"$l/uni", b)
      synth(bgOneShot, "__c", s"$l/bg", b)
      l
    }
    partCounts("pmi_bg") = pmiLakes.map(l => partitions(s"$l/bg"))
    def pmiRead(l: String) = graft.pipeline.TextAnalysis.pmiFromCounts(
      StoreCompaction.read(spark, s"$l/uni"), StoreCompaction.read(spark, s"$l/bg"),
      minCount = 5, k = 40, headVocab = 2048)
    readRow("p_synth_pmi_read", pmiRead, pmiLakes)
    record("p_synth_pmi_fold", pmiLakes.map(l => time {
      StoreCompaction.compactCounts(spark, s"$l/uni", Seq("tk"))
      StoreCompaction.compactCounts(spark, s"$l/bg", Seq("w1", "w2"))
      partitions(s"$l/bg")
    }))
    readRow("p_synth_pmi_read_compacted", pmiRead, pmiLakes)

    val sb = new StringBuilder
    sb ++= "{\"batches\": [" + bs.mkString(", ") + "], \"queries\": {"
    sb ++= results.iterator.map { case (q, (secs, rows)) =>
      val ratio = secs(1) / math.max(secs(0), 1e-9)
      f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "ratio": $ratio%.2f}"""
    }.mkString(",")
    sb ++= "\n}, \"partials_written\": {" + partCounts.map { case (k, v) =>
      s"""\"$k\": [${v.mkString(", ")}]""" }.mkString(", ") + "}, " +
      "\"notes\": {" +
      "\"axis\": \"batch COUNT via SYNTHESIZED partials (counts-are-sums: any decomposition into non-negative summands is a valid partial history; the merged read is bit-identical by construction) - 100 vs 1000 batch_id partitions; 1000 ~ 70% of a full day at a 1-min trigger\", " +
      "\"fold rows\": \"value = surviving batch_id partitions after the fold (snapshot + open max batch = 2)\", " +
      "\"read timing\": \"reads materialize EVERY column via a hash-checksum aggregate, so column pruning cannot drop the count columns from the scans (a bare count() understated the byte-read axis)\", " +
      "\"partials_written\": \"stores whose count mass is below batch k write no row for k, matching real batches that only write touched keys - the listing cost under test scales with the written partition count\"}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** Density-axis probe for the transparent SQL rollup serve:
   *  `runMain graft.ScaleProbe --routed-dense [out]`. The --tsdb-xl
   *  generator scales SERIES COUNT with event count (users = n/666), so
   *  the 1h composite there is nearly fact-sized (<1.1 points per
   *  series-hour measured at n1M: 913k store rows for 1M events) and the
   *  routed read can only track the raw scan — rollups compress the TIME
   *  axis, not the series axis. This mode holds the series set FIXED
   *  (1500 users) while events grow 1M → 10M — the metrics-get-denser
   *  regime ingest-time rollups exist for (reference: ingest-time
   *  DownSampler, core/.../downsample/DownSampler.java:32-56): the raw
   *  daily-sum SQL grows with points while the routed rewrite of the
   *  SAME SQL stays store-sized (|series| × hours, constant across the
   *  decade). Store builds run untimed, like every maintained read in
   *  --tsdb-xl. */
  private def mainRoutedDense(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--routed-dense")
    val out = rest.headOption.getOrElse("/tmp/scale_routed_dense.json")
    val spark = graft.core.GraftSession.builder()
      .appName("graft-scale-routed-dense").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("GRAFT_SCALE_DENSE_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale_dense").toString)
    // third decade (round 13, verdict #6): 100M points over the same
    // fixed 1,500 series — the regime where the raw path's sort spill
    // appears; the routed read must stay store-sized (flat)
    val ns = Seq(1000000L, 10000000L, 100000000L)
    val dirs = ns.map(n => s"$base/n$n")
    ns.zip(dirs).withFilter { case (_, d) =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet"))
    }.foreach { case (n, d) => genEventsDistributed(spark, n, 1500, d) }
    for (d <- dirs) graft.queries.RollupQueries.warmBuilds(spark, d)
    spark.catalog.clearCache()
    val queries = SparkEntry.queries
    val sb = new StringBuilder
    sb ++= "{\"events\": [" + ns.mkString(", ") + "], \"users\": 1500, \"queries\": {"
    var first = true
    // raw vs the 1h-routed rewrite vs the LADDER's 1d rung: the raw scan
    // grows with points, the 1h serve is store-sized (|series| × hours,
    // constant), the 1d serve is 24× smaller again — the coarsest-rung
    // dividend at any density. Round 14 adds the window() and tz-idiom
    // PHRASINGS of the same dashboard: both must ride the same flat
    // store-sized curve (the serve decision is phrasing-independent).
    for (q <- Seq("q_ds_sum", "q_sql_rollup_routed", "q_sql_rollup_ladder_daily",
        "q_sql_rollup_window", "q_sql_rollup_tz_day")) {
      queries(q)(spark, dirs.head).count() // warm (JIT + listing)
      spark.catalog.clearCache()
      val measured = dirs.map { d =>
        val m = time(queries(q)(spark, d).count())
        spark.catalog.clearCache()
        m
      }
      val secs = measured.map(_._1)
      val rows = measured.map(_._2)
      val r10 = secs(1) / math.max(secs(0), 1e-9)
      val rLast = secs.last / math.max(secs(0), 1e-9)
      if (!first) sb ++= ", "
      first = false
      sb ++= f"""\n  "$q": {"sec": [${secs.map(s => f"$s%.3f").mkString(", ")}], "rows": [${rows.mkString(", ")}], "r10": $r10%.2f, "r${math.pow(10, ns.size - 1).toLong}%d": $rLast%.2f}"""
      println(f"$q%-24s ${secs.map(s => f"$s%7.2f").mkString(" ")}s r10=$r10%6.2f rN=$rLast%6.2f rows=${rows.mkString("/")}")
    }
    sb ++= "\n}, \"notes\": {" +
      "\"axis\": \"point DENSITY: series set FIXED at 1500 users while events grow 1M -> 10M -> 100M over the same 30 days - the regime ingest-time rollups exist for (--tsdb-xl scales series WITH events, so its composite is nearly fact-sized and cannot isolate this)\", " +
      "\"builds\": \"the 1h and 1d rollup stores are built UNTIMED (RollupQueries.warmBuilds) before measurement, like every maintained read in the other probes; rows time only the read\", " +
      "\"queries\": \"q_ds_sum is the raw daily-sum engine path (grows with points); q_sql_rollup_routed is the IDENTICAL SQL served from the 1h composite by the RollupRouting rewrite (store-sized: |series| x hours, constant across decades); q_sql_rollup_ladder_daily serves from the 1d rung (24x smaller again); q_sql_rollup_window and q_sql_rollup_tz_day are the window() and Denver-tz PHRASINGS of the same dashboard, served by the same rewrite (round 14: phrasing-independence at scale)\"}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }

  /** Frontier-aware rung-choice probe (`--ladder-fresh`, writes
   *  BENCH_SCALE_LADDER_FRESH.json) — the round-15 dispatch change. The
   *  deployment shape: ladder rungs maintained by SEPARATE jobs at their
   *  own cadences (an hourly 1h job, a nightly 1d job), so the 1d store's
   *  frontier genuinely lags a day. A "last 2 days" daily dashboard then
   *  straddles the 1d frontier while sitting entirely under the 1h one.
   *  Rounds 13-14 dispatched first-coarsest-with-any-head: day 1 from
   *  the 1d store, the ENTIRE open day re-scanned raw (dedupe window +
   *  3.3M-point scan at the 100M-event density). Round 15 ranks rungs by
   *  served frontier, so the fully-flushed 1h rung serves both days
   *  store-sized. Same dense regime as --routed-dense (1,500 fixed
   *  series, 100M events / 30 days); stores build untimed; the two
   *  dispatches are value-checked against each other before timing. */
  private def mainLadderFresh(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--ladder-fresh")
    val out = rest.headOption.getOrElse("BENCH_SCALE_LADDER_FRESH.json")
    val spark = graft.core.GraftSession.builder()
      .appName("graft-scale-ladder-fresh").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.query.DownsampleSpec
    val base = sys.env.getOrElse("GRAFT_SCALE_DENSE_DIR",
      java.nio.file.Files.createTempDirectory("graft_scale_dense").toString)
    val n = 100000000L
    val d = s"$base/n$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet")))
      genEventsDistributed(spark, n, 1500, d)
    val pts = graft.sources.TsdbViews.points(spark, d)
    val stores = java.nio.file.Files.createTempDirectory("graft_ladder_fresh").toString
    graft.rollup.Rollup.build(pts, "1h").write.mode("overwrite").parquet(s"$stores/rollup1h")
    graft.rollup.Rollup.build(pts, "1d").write.mode("overwrite").parquet(s"$stores/rollup1d")
    val s1h = spark.read.parquet(s"$stores/rollup1h")
    val s1d = spark.read.parquet(s"$stores/rollup1d")
    val day = 86400L
    val dataStart = 1704067200L
    val (qs, qe) = (dataStart + 28 * day, dataStart + 30 * day)
    val f1d = dataStart + 29 * day // the nightly 1d job hasn't flushed the last day
    val spec = DownsampleSpec("1d", "sum")
    val ptsQ = pts.filter(col("ts") >= lit(qs) && col("ts") < lit(qe))
    // rounds 13-14 behavior: the coarsest rung with any served head wins
    // outright — day 1 from the 1d store, day 2 raw
    def oldDispatch() = graft.rollup.Rollup
      .downsampleHybrid(ptsQ, s1d, "1d", spec, qs, qe, f1d)
    def newDispatch() = graft.rollup.Rollup.downsampleLadder(ptsQ,
      Seq((s1d, "1d", f1d), (s1h, "1h", Long.MaxValue)), spec, qs, qe)
    // value check before timing: both dispatches must agree exactly on
    // rows and on the summed value (modulo FP summation order)
    def chk(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)), sum(col("value"))).head
      (r.getLong(0), r.getDouble(1))
    }
    val (rOld, vOld) = chk(oldDispatch())
    val (rNew, vNew) = chk(newDispatch())
    require(rOld == rNew && math.abs(vOld - vNew) <= 1e-6 * math.abs(vOld),
      s"dispatches disagree: rows $rOld/$rNew values $vOld/$vNew")
    val (tOld, _) = time(oldDispatch().count())
    spark.catalog.clearCache()
    val (tNew, _) = time(newDispatch().count())
    val sb = new StringBuilder
    sb ++= f"""{"events": $n, "users": 1500, "window_days": 2,
      |"straddling_daily_read_sec": {"first_coarsest_r14": $tOld%.3f, "frontier_ranked_r15": $tNew%.3f, "speedup": ${tOld / math.max(tNew, 1e-9)}%.2f, "rows": $rOld},
      |"notes": {
      |"axis": "independently-maintained ladder rungs (hourly 1h job fresh, nightly 1d job one day behind): the last-2-days daily dashboard straddles the 1d frontier but sits wholly under the 1h one",
      |"old": "rounds 13-14 first-coarsest-with-any-head: day 1 from the 1d store + the WHOLE open day raw (LWW dedupe window over ~n/30 points at this density)",
      |"new": "round 15 ranks rungs by served frontier (tie-break coarser): the 1h rung serves both days store-sized (|series| x 48 rows re-aggregated), no raw scan",
      |"check": "both dispatches value-checked equal (rows exact, sum within FP reorder tolerance) before timing; stores built untimed"}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(f"straddling 2-day dashboard: old=$tOld%.2f s new=$tNew%.2f s (x${tOld / math.max(tNew, 1e-9)}%.1f)")
    println(s"wrote $out")
    spark.stop()
  }

  /** Ladder-maintenance cost/benefit probe (`--ladder-ingest`, writes
   *  BENCH_SCALE_LADDER.json) — the round-14 question: what does
   *  MAINTAINING a second (1d) rung cost at ingest, and what does it buy
   *  at read? The sf0.1 events stream arrives as 30 time-ordered daily
   *  micro-batches (the event-time high-water mark closes each previous
   *  day) into two lakes: 1h-only vs a 1h+1d ladder. Measured: total
   *  processBatch wall per variant — the ladder's extra cost is ONE
   *  idempotent day-window flush per closed day (re-reading ≤ 12 closed
   *  2h segments), amortized over that day's batches — then the daily
   *  dashboard read three ways over the ladder lake: raw engine
   *  downsample, the 1h-rung serve, and the 1d-rung serve. Ingest runs
   *  are timed once (streaming variance noted in the artifact). */
  private def mainLadderIngest(args: Array[String]): Unit = {
    val rest = args.filterNot(_ == "--ladder-ingest")
    val out = rest.headOption.getOrElse("BENCH_SCALE_LADDER.json")
    val spark = graft.core.GraftSession.builder()
      .appName("graft-scale-ladder").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.streaming.IngestJob
    import graft.query.DownsampleSpec
    val sf = sys.env.getOrElse("GRAFT_LADDER_SF_DIR", "/root/testdata/sf0.1")
    val day = 86400L
    val start = graft.queries.OracleCommon.DataStart
    val days = 30
    val events = spark.read.parquet(s"$sf/events.parquet")
    def ingest(tag: String, ladder: Seq[String], nDays: Int = days)
        : (IngestJob.Config, Double) = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ladder_$tag").toString
      val cfg = IngestJob.Config(s"$base/lake", s"$base/ckpt",
        retentionSec = Long.MaxValue / 4, maxFutureSec = Long.MaxValue / 4,
        rollupInterval = Some("1h"), rollupLadder = ladder)
      val t0 = System.nanoTime()
      var d = 0
      while (d < nDays) {
        val lo = start + d * day
        val slice = events.filter(col("ts") >= timestamp_seconds(lit(lo)) &&
          col("ts") < timestamp_seconds(lit(lo + day)))
        IngestJob.processBatch(graft.sources.TsdbViews.pointsFromEvents(slice),
          cfg, batchId = d.toLong)
        d += 1
      }
      (cfg, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warm-up lake: the first ingest of a fresh JVM pays
    // codegen/JIT for the whole batch pipeline — without this the
    // first-measured variant reads 1.4x slower from cold-start alone
    ingest("warm", Seq("1d"), nDays = 5)
    val (cfg1h, sec1h) = ingest("1h", Nil)
    val (cfgL, secL) = ingest("both", Seq("1d"))
    def parts(cfg: IngestJob.Config, iv: String): Long = {
      val dir = new java.io.File(IngestJob.rungPath(cfg, iv))
      Option(dir.listFiles())
        .map(_.count(_.getName.startsWith("segment_start=")).toLong).getOrElse(0L)
    }
    // the daily dashboard over [Start, End) — entirely below every
    // frontier after 30 daily batches, so each rung serves it fully
    val (qs, qe) = (graft.queries.OracleCommon.Start, graft.queries.OracleCommon.End)
    val spec = DownsampleSpec("1d", "sum")
    def raw(): Long = graft.query.QueryEngine.downsample(
      graft.query.QueryEngine.dedupeConfigured(IngestJob.points(spark, cfgL)
        .filter(col("ts") >= lit(qs) && col("ts") < lit(qe))),
      spec, qs, qe).count()
    def rung(iv: String): Long = graft.rollup.Rollup.downsampleLadder(
      IngestJob.points(spark, cfgL),
      Seq((IngestJob.rollupRung(spark, cfgL, iv), iv,
        IngestJob.rungFrontier(spark, cfgL, iv))),
      spec, qs, qe).count()
    raw(); val (tRaw, nRaw) = time(raw())
    rung("1h"); val (t1h, n1h) = time(rung("1h"))
    rung("1d"); val (t1d, n1d) = time(rung("1d"))
    require(nRaw == n1h && n1h == n1d,
      s"rung serves disagree on row count: raw=$nRaw 1h=$n1h 1d=$n1d")
    val sb = new StringBuilder
    sb ++= f"""{"days": $days, "events": 100000,
      |"ingest_sec": {"1h_only": $sec1h%.1f, "ladder_1h_1d": $secL%.1f, "overhead_ratio": ${secL / math.max(sec1h, 1e-9)}%.3f},
      |"rung_partitions": {"1h": ${parts(cfgL, "1h")}, "1d": ${parts(cfgL, "1d")}},
      |"daily_read_sec": {"raw": $tRaw%.3f, "rung_1h": $t1h%.3f, "rung_1d": $t1d%.3f, "rows": $nRaw},
      |"notes": {
      |"axis": "cost/benefit of MAINTAINING the 1d rung beside the 1h primary: 30 time-ordered daily batches (event-time hwm closes the previous day each batch), identical data into both lakes; timed once per variant (streaming variance)",
      |"ingest": "the ladder's extra work is PER CLOSED DAY (one idempotent 1d-window flush re-reading <= 12 closed 2h segments), independent of trigger cadence - this probe's 1-batch-per-day cadence is the WORST-case amortization (every batch pays a day flush), and even so the measured delta sits BELOW the +/-15 pct same-host run noise STATUS documents (repeated runs land on either side of 1.0): ~29 day flushes of ~1s inside ~100s of total ingest. At a production 1-min trigger the same per-day flush amortizes over ~1440 batches",
      |"read": "the daily dashboard [Start, End) served raw vs from each rung over the SAME ladder lake; row counts asserted equal across all three. sf0.1 is SPARSE (~1 point per series-hour, composite nearly fact-sized), so rung reads only modestly beat raw here - the DENSITY axis where the routed read is 40x flat vs raw lives in BENCH_SCALE_DENSE; this artifact's contribution is the ingest-side cost"}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(f"ingest 1h=$sec1h%.1f s ladder=$secL%.1f s (x${secL / sec1h}%.2f); read raw=$tRaw%.2f 1h=$t1h%.2f 1d=$t1d%.2f")
    println(s"wrote $out")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--ladder-fresh")) { mainLadderFresh(args); return }
    if (args.contains("--ladder-ingest")) { mainLadderIngest(args); return }
    if (args.contains("--routed-dense")) { mainRoutedDense(args); return }
    if (args.contains("--batches-synth")) { mainBatchesSynth(args); return }
    if (args.contains("--batches")) { mainBatches(args); return }
    if (args.contains("--tsdb-xl")) { mainTsdbXl(args); return }
    if (args.contains("--xl4")) { mainXl4(args); return }
    if (args.contains("--xl")) { mainXl(args); return }
    if (args.contains("--zipf")) { mainZipf(args); return }
    val out = args.headOption.getOrElse("BENCH_SCALE.json")
    // optional name filter (args 2..n) for targeted local iteration; a
    // filtered run writes to the given out path (pass something other
    // than BENCH_SCALE.json so the full artifact is not clobbered)
    val only = args.drop(1).toSet
    val spark = graft.core.GraftSession.builder().appName("graft-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val (small, large) = (s"$base/small", s"$base/large")
    val (nSmall, nLarge) = (5000, 50000)
    genDocs(spark, nSmall, small); genEmbeddings(spark, nSmall * 2 / 5, small)
    genDocs(spark, nLarge, large); genEmbeddings(spark, nLarge * 2 / 5, large)
    genEvents(spark, nSmall * 20, 150, small)
    genEvents(spark, nLarge * 20, 1500, large)

    val queries = SparkEntry.queries ++ ProbeOnly
    val sb = new StringBuilder
    sb ++= "{\"docs_small\": " + nSmall + ", \"docs_large\": " + nLarge + ", \"queries\": {"
    var first = true
    for (q <- (Probed ++ TsdbProbed)
         if queries.contains(q) && (only.isEmpty || only.contains(q))) {
      // warm both (JIT + file listing), then measure; clear persisted
      // state between measurements so each query pays its own persists —
      // round 5's q_pipeline_sample_stratified read 14.6× at 10× inside
      // the sweep but 1.06× isolated: accumulated persisted frames from
      // earlier queries (LSH signatures etc.) were squeezing the storage
      // pool, not anything in the query's own plan
      queries(q)(spark, small).count()
      spark.catalog.clearCache()
      val (ts, rs) = time(queries(q)(spark, small).count())
      spark.catalog.clearCache()
      val (tl, rl) = time(queries(q)(spark, large).count())
      spark.catalog.clearCache()
      val ratio = tl / math.max(ts, 1e-9)
      if (!first) sb ++= ", "
      first = false
      sb ++= f"""\n  "$q": {"small_sec": $ts%.3f, "large_sec": $tl%.3f, "ratio": $ratio%.2f, "rows_small": $rs, "rows_large": $rl}"""
      println(f"$q%-28s small=$ts%7.2fs large=$tl%8.2fs ratio=$ratio%6.2f rows=$rs%8d -> $rl%9d")
    }
    sb ++= "\n}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
