package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level training-data operators: selection, reproducible
 *  sampling, sequence packing. */
class CorpusSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private def spark = TestSpark.spark
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSample: deterministic, monotone in rate, exact at the extremes") {
    val all = docs.count()
    assert(Corpus.hashSample(docs, col("doc_id"), 0).count() === 0)
    assert(Corpus.hashSample(docs, col("doc_id"), 1000).count() === all)
    val s250 = Corpus.hashSample(docs, col("doc_id"), 250)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s500 = Corpus.hashSample(docs, col("doc_id"), 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s250.subsetOf(s500), "a lower rate must be a subset of a higher one")
    // rerun: membership is a pure function of the key
    val again = Corpus.hashSample(docs, col("doc_id"), 250)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === s250)
  }

  test("mixToProportions: exact quotas, scarcity-bound total, unlisted domains drop") {
    val s = spark
    import s.implicits._
    // src A: 10 docs, B: 6, C: 30, D (unlisted): 5
    val d = ((0 until 10).map(i => (i.toLong, "A")) ++
      (10 until 16).map(i => (i.toLong, "B")) ++
      (16 until 46).map(i => (i.toLong, "C")) ++
      (46 until 51).map(i => (i.toLong, "D")))
      .toDF("doc_id", "source")
    // targets 50/30/20: B is the scarce domain (6/0.3 = 20 feasible)
    val out = Corpus.mixToProportions(d, "source",
      Map("A" -> 500, "B" -> 300, "C" -> 200)).collect()
    val byDom = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // T = min(10*1000/500, 6*1000/300, 30*1000/200) = min(20, 20, 150) = 20
    assert(byDom === Map("A" -> 10, "B" -> 6, "C" -> 4))
    assert(!out.exists(_.getString(1) == "D"), "unlisted domains contribute nothing")
    // deterministic: replay is exact
    val again = Corpus.mixToProportions(d, "source",
      Map("A" -> 500, "B" -> 300, "C" -> 200)).collect()
    assert(again.map(_.getLong(0)).sorted.toSeq === out.map(_.getLong(0)).sorted.toSeq)
    // a listed domain with ZERO docs makes exact composition infeasible:
    // the output is empty, never a best-effort mix missing that domain
    assert(Corpus.mixToProportions(d, "source",
      Map("A" -> 500, "E" -> 500)).count() === 0)
    // FRACTIONAL feasible total: counts A=40, B=10, C=30 at 500/300/200.
    // T = min(floor(80), floor(33.33), floor(150)) = 33 (FLOOR, not 33.33)
    // so quotas are floor(500*33/1000)=16, floor(300*33/1000)=9,
    // floor(200*33/1000)=6 — true division would hand B 10 docs
    val frac = ((0 until 40).map(i => (i.toLong, "A")) ++
      (40 until 50).map(i => (i.toLong, "B")) ++
      (50 until 80).map(i => (i.toLong, "C")))
      .toDF("doc_id", "source")
    val fracOut = Corpus.mixToProportions(frac, "source",
      Map("A" -> 500, "B" -> 300, "C" -> 200)).collect()
    val fracByDom = fracOut.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(fracByDom === Map("A" -> 16, "B" -> 9, "C" -> 6))
    // a lone over-1000 share or empty targets fail the config
    intercept[IllegalArgumentException] {
      Corpus.mixToProportions(d, "source", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Corpus.mixToProportions(d, "source", Map("A" -> 700, "B" -> 400))
    }
  }

  test("epochSchedule: per-bucket repetition counts; zero epochs drops the bucket") {
    val out = Corpus.epochSchedule(docs, 333, 333, 3, 2, 1).collect()
    val buckets = Corpus.qualityBuckets(docs, 333, 333).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val perDoc = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).sorted.toSeq).toMap
    assert(perDoc.keySet === buckets.keySet, "every doc appears (no bucket has 0 epochs)")
    perDoc.foreach { case (id, epochs) =>
      val want = buckets(id) match {
        case "head" => Seq(1, 2, 3); case "middle" => Seq(1, 2); case _ => Seq(1)
      }
      assert(epochs === want, s"doc $id bucket ${buckets(id)}")
    }
    // tail = 0 drops the tail bucket entirely
    val noTail = Corpus.epochSchedule(docs, 333, 333, 1, 1, 0).collect()
      .map(_.getLong(0)).toSet
    assert(noTail === buckets.filter(_._2 != "tail").keySet)
    intercept[IllegalArgumentException] {
      Corpus.epochSchedule(docs, 333, 333, -1, 1, 1)
    }
  }

  test("trainValTestSplit: disjoint, exhaustive, proportional, re-salt re-deals") {
    val out = Corpus.trainValTestSplit(docs, 800, 100, salt = "s1").collect()
    assert(out.length === docs.count())
    assert(out.map(_.getLong(0)).distinct.length === out.length, "each doc in exactly one slice")
    val bySlice = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySlice.keySet === Set("train", "val", "test"))
    // hash proportions at n=500: train ~80% (binomial noise ±~5%)
    assert(bySlice("train") > out.length * 7 / 10 && bySlice("train") < out.length * 9 / 10)
    // re-salting re-deals some docs; same salt replays exactly
    val again = Corpus.trainValTestSplit(docs, 800, 100, salt = "s1").collect()
    assert(again.map(r => r.getLong(0) -> r.getString(1)).toMap ===
      out.map(r => r.getLong(0) -> r.getString(1)).toMap)
    val other = Corpus.trainValTestSplit(docs, 800, 100, salt = "s2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.exists(r => other(r.getLong(0)) != r.getString(1)))
  }

  test("shuffleShards: dense per-shard positions, full cover, no global sort in the plan") {
    val df = Corpus.shuffleShards(docs, 8, salt = "e0")
    val out = df.collect()
    assert(out.map(_.getLong(0)).distinct.length === docs.count())
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq,
        "positions must be dense 1..n within each shard")
    }
    // a new salt is a new epoch: some doc changes (shard, pos)
    val e1 = Corpus.shuffleShards(docs, 8, salt = "e1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.exists(r => e1(r.getLong(0)) != ((r.getLong(1), r.getLong(2)))))
    // scale shape: the only sort is the per-shard window sort — a global
    // permutation via ORDER BY would show range partitioning
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "no global sort: the permutation lives in (shard, pos), each shard sorted locally")
  }

  test("selectByTokenBudgetByDomain: each domain independently budget-capped, greedy-prefix") {
    // the driver corpus predicts one language for every doc (its vocab
    // carries only English markers), so plant a bilingual corpus: half
    // the docs carry German markers and must fill their OWN budget
    val spark2 = spark
    import spark2.implicits._
    val en = (1 to 40).map(i => (i.toLong,
      s"the quick value of stream $i and the merge of table $i is large plus ${"pad " * (i % 7)}"))
    val de = (41 to 80).map(i => (i.toLong,
      s"der schnelle wert und die tabelle $i ist und das fenster $i ist gross ${"pad " * (i % 5)}"))
    val bi = (en ++ de).toDF("doc_id", "text")
    val budget = 120L
    val out = Corpus.selectByTokenBudgetByDomain(bi, budget).collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_.getString(1))
    assert(byLang.size >= 2, "multiple domains must be represented")
    // greedy restatement per domain: cumulative tokens in (score desc,
    // doc_id asc) order, keep while the prefix-before stays under budget
    val full = TextAnalysis.langQuality(bi)
      .select(col("doc_id"), col("pred_lang"), round(col("quality_score"), 4).as("s"))
      .join(bi.select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val expect = full.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      var before = 0L
      rows.sortBy(r => (-r._3, r._1)).takeWhile { r =>
        val ok = before < budget; before += r._4; ok
      }.map(r => (r._1, lang)).toSeq
    }.toSet
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSet === expect)
    // and each domain's selection stays within budget + one straddling doc
    byLang.foreach { case (_, rows) =>
      val toks = rows.map(_.getLong(2))
      assert(toks.sum - toks.max < budget)
    }
  }

  test("chunkStrided: degenerates to chunk at stride = window; overlaps correctly") {
    val s = spark
    import s.implicits._
    val tokens40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, tokens40)).toDF("doc_id", "text")

    // stride = window ⇒ exactly chunk() on the shared columns
    val plain = Corpus.chunk(docs, 32).orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp").collect()
    val strided = Corpus.chunkStrided(docs, 32, 32).orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp").collect()
    assert(plain.toSeq === strided.toSeq)

    // 40 tokens, window 32, stride 16 → 3 chunks at starts 0/16/32 with
    // 32/24/8 tokens; chunk 1 is exactly tokens 17..40
    val out = Corpus.chunkStrided(d, 32, 16).orderBy("chunk_id").collect()
    assert(out.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_pos"),
      r.getAs[Long]("n_tokens"))).toSeq === Seq((0L, 0L, 32L), (1L, 16L, 24L), (2L, 32L, 8L)))
    val expect1 = (17 to 40).map(i => s"w$i").mkString(" ")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(expect1.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getAs[String]("chunk_fp") === md5hex)
  }

  test("temperatureSample: α=½ rates from the domain histogram, hash membership") {
    val s = spark
    import s.implicits._
    // domains sized 64/16/4 → rates 175/350/700 (floor(700·√(4/n)))
    val rows = (1 to 64).map(i => (i.toLong, s"doc $i", "big")) ++
      (65 to 80).map(i => (i.toLong, s"doc $i", "mid")) ++
      (81 to 84).map(i => (i.toLong, s"doc $i", "rare"))
    val d = rows.toDF("doc_id", "text", "source")
    val out = Corpus.temperatureSample(d, "source", 700).collect()
    val rates = out.map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_permille"))
      .toMap
    assert(rates === Map("big" -> 175L, "mid" -> 350L, "rare" -> 700L))
    // membership is exactly the md5-prefix rule, independently recomputed
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % 1000
    }
    val expected = rows.collect {
      case (id, _, src) if bucket(id) < Map("big" -> 175L, "mid" -> 350L, "rare" -> 700L)(src) => id
    }.toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expected)
  }

  test("qualityBuckets: whole-bucket landing rule, exhaustive disjoint partition") {
    val out = Corpus.qualityBuckets(docs, 333, 333).collect()
    assert(out.length === docs.count())
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // every head score strictly above every middle score, middle above tail
    def scores(b: String) = byBucket(b).map(_.getAs[Double]("quality_score"))
    assert(scores("head").min > scores("middle").max)
    assert(scores("middle").min > scores("tail").max)
    // tied scores land whole: equal scores never split across buckets
    out.groupBy(_.getAs[Double]("quality_score")).values.foreach { rows =>
      assert(rows.map(_.getAs[String]("bucket")).distinct.length === 1)
    }
    // head holds ≥ 333‰ of docs (bucket lands whole, so never less), and
    // no more than the head budget plus one straddling score bucket
    val n = out.length
    assert(byBucket("head").length * 1000 >= 333 * n)
  }

  test("removeDuplicateSpans: canonical block survives, clones vanish, rebuild exact") {
    val s = spark
    import s.implicits._
    val block = (1 to 16).map(i => s"b$i").mkString(" ") // one shared 16-token block
    val rest = (1 to 20).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (1L, block + " " + rest),  // canonical holder of the shared block
      (2L, block + " " + rest),  // exact clone: EVERY block duplicated → vanishes
      (3L, block + " " + (1 to 16).map(i => s"z$i").mkString(" ")) // shares only block 0
    ).toDF("doc_id", "text")
    val out = Corpus.removeDuplicateSpans(d, 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out.keySet === Set(1L, 3L)) // doc 2 fully deduplicated away
    assert(out(1L).getAs[Long]("n_blocks_kept") === 3L) // 36 tokens → 3 blocks, all first
    assert(out(1L).getAs[Long]("n_blocks_dropped") === 0L)
    assert(out(1L).getAs[Long]("n_tokens_kept") === 36L)
    assert(out(3L).getAs[Long]("n_blocks_kept") === 1L) // block 0 deduped away
    assert(out(3L).getAs[Long]("n_blocks_dropped") === 1L)
    assert(out(3L).getAs[Long]("n_tokens_kept") === 16L)
    // rebuilt stream of doc 3 is exactly its own tail block
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 16).map(i => s"z$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(3L).getAs[String]("kept_hash") === md5hex)
  }

  test("pack: offsets stay under budget, spans are contiguous per shard") {
    val budget = 512L
    val packed = Corpus.pack(docs, budget, nShards = 8)
      .orderBy("shard", "doc_id").collect()
    assert(packed.nonEmpty)
    assert(packed.forall(r => r.getAs[Long]("bin_offset") < budget))
    // within a shard: each doc starts exactly where the previous ended
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectBefore = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val globalOffset = r.getAs[Long]("bin") * budget + r.getAs[Long]("bin_offset")
        assert(globalOffset === expectBefore)
        expectBefore += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("selectByTokenBudget equals the greedy best-first selection; budget respected") {
    val budget = 3000L
    val out = Corpus.selectByTokenBudget(docs, budget).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // greedy ground truth: sort (score desc, doc_id asc), take while the
    // span START is inside the budget
    val all = TextAnalysis.quality(docs)
      .select(col("doc_id"), round(col("quality_score"), 4).as("s"))
      .join(docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    var cum = 0L
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    all.foreach { case (id, s, n) =>
      if (cum < budget) expect(id) = (n, s)
      cum += n
    }
    assert(out === expect.toMap)
    assert(out.nonEmpty && out.size < all.length, "budget must be a real filter")
    // the selection overshoots the budget by at most one document
    val selected = all.filter(t => out.contains(t._1))
    assert(selected.map(_._3).sum - selected.map(_._3).max <= budget)
  }

  test("selectByTokenBudget: only the budget-straddling score bucket is windowed") {
    val spark2 = spark
    import spark2.implicits._
    // degenerate corpus: every doc shares ONE snapped score (same text
    // modulo doc_id — identical token stats), 10 tokens per doc
    val one = (1L to 100L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    // budget above the total: the single bucket is fully funded — all
    // docs selected and the per-doc window input is empty
    assert(Corpus.selectByTokenBudget(one, 100000L).count() === 100)
    // budget inside the bucket: greedy doc_id-order prefix (span starts
    // at 0,10,…; start < 95 ⇒ docs 1..10)
    val picked = Corpus.selectByTokenBudget(one, 95L).collect().map(_.getLong(0)).toSet
    assert(picked === (1L to 10L).toSet)
    // plan pin: the per-doc prefix window (ordered by doc_id) sits above
    // a filter referencing the bucket-size column — i.e. ONLY the
    // straddling bucket's rows reach the window, so a fully-funded
    // degenerate bucket can never serialize through one window task
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    val lp = Corpus.selectByTokenBudget(one, 95L).queryExecution.optimizedPlan
    val perDocWins = lp.collect {
      case w: Window if w.orderSpec.exists(_.child.references.exists(_.name == "doc_id")) => w
    }
    assert(perDocWins.nonEmpty, "the in-bucket prefix window must exist")
    assert(perDocWins.forall(_.child.collectFirst {
      case f: Filter if f.condition.references.exists(_.name.contains("__bucket_tokens")) => f
    }.isDefined), "the window input must be pre-filtered to the straddling bucket")
  }

  test("packIndex: boundary strings reconstruct pack exactly; counts consistent") {
    val packed = Corpus.pack(docs, 512, 8).collect()
      .groupBy(r => (r.getLong(2), r.getLong(3)))
    val idx = Corpus.packIndex(docs, 512, 8).collect()
    assert(idx.map(r => (r.getLong(0), r.getLong(1))).toSet === packed.keySet)
    idx.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val members = packed(key)
      assert(r.getLong(2) === members.length.toLong, "n_docs")
      assert(r.getLong(3) === members.map(_.getLong(1)).sum, "n_tokens")
      // parse "doc:offset,..." → must equal the bin's (doc, offset) pairs
      // in (offset, doc) order
      val parsed = r.getString(4).split(",").map { s =>
        val Array(d, o) = s.split(":"); (d.toLong, o.toLong)
      }.toSeq
      val expect = members.map(m => (m.getLong(0), m.getLong(4)))
        .sortBy { case (d, o) => (o, d) }.toSeq
      assert(parsed === expect)
    }
  }

  test("pack: hash sharding balances a sparse, clustered id space") {
    val spark2 = spark
    import spark2.implicits._
    // pathological id space for a range shard: one dense cluster at 0-99
    // and one sparse far cluster at 10M + 1000*i — doc_id/shardEvery puts
    // each cluster in its own shard (2 used shards, 100:100); the hash
    // shard must spread BOTH clusters across all shards
    val ids = (0L until 100L) ++ (0L until 100L).map(i => 10000000L + i * 1000L)
    val skewed = ids.map(i => (i, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val byShard = Corpus.pack(skewed, 512, nShards = 8)
      .groupBy("shard").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.size === 8, s"all shards used: $byShard")
    assert(byShard.values.max <= 3L * byShard.values.min,
      s"hash shards must stay balanced, got $byShard")
  }

  test("topKByDomain: dense ranks per language, scores non-increasing, true top-k") {
    val k = 5
    val top = Corpus.topKByDomain(docs, k).collect()
    assert(top.nonEmpty)
    val all = TextAnalysis.langid(docs).select(col("doc_id"), col("pred_lang"))
      .join(TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    top.groupBy(_.getAs[String]("pred_lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("quality_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // the selected ids are exactly the language's best-k by (score, id)
      val expect = all.filter(_._2 == lang).sortBy(t => (-t._3, t._1))
        .take(k).map(_._1).toSet
      assert(sorted.map(_.getAs[Long]("doc_id")).toSet === expect)
    }
  }

  test("chunk: windows cover every token exactly once, only the tail is short") {
    val budget = 32L
    val chunks = Corpus.chunk(docs, budget.toInt).collect()
    val tokenCounts = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val n = tokenCounts(id)
      assert(rows.length === ((n + budget - 1) / budget))
      assert(rows.map(_.getAs[Long]("n_tokens")).sum === n)
      // chunk ids are 0..k-1 and every chunk but the last is full
      val byId = rows.sortBy(_.getAs[Long]("chunk_id"))
      assert(byId.map(_.getAs[Long]("chunk_id")).toSeq === (0L until rows.length.toLong))
      assert(byId.dropRight(1).forall(_.getAs[Long]("n_tokens") === budget))
    }
  }

  test("report: one-row funnel with consistent gate counts") {
    val rep = Corpus.report(docs, 0.5).collect()
    assert(rep.length === 1)
    val r = rep.head
    val nDocs = r.getAs[Long]("n_docs")
    assert(nDocs === docs.count())
    assert(r.getAs[Long]("n_keep_quality") <= nDocs)
    assert(r.getAs[Long]("n_exact_canonical") <= nDocs)
    assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_keep_quality"))
    assert(r.getAs[Long]("tokens_selected") <= r.getAs[Long]("tokens_total"))
    assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_clustered_docs"))
    assert(r.getAs[Long]("n_selected") === Corpus.select(docs, 0.5).count())
  }

  test("corpus selection survivors are quality-keepers and unique per content/cluster") {
    val sel = Corpus.select(docs, 0.5)
    val ids = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < docs.count())
    // no two survivors share normalized content
    val hashes = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .select(md5(Dedup.normalized(col("text")))).collect().map(_.getString(0))
    assert(hashes.length === hashes.distinct.length)
  }

  test("selectBestPerCluster keeps the highest-quality member where select keeps the root") {
    val sp = spark
    import sp.implicits._
    // docs 1 and 2 share a long common prefix (near-dups well above the
    // 0.5 threshold); the tails differ so doc 2 scores HIGHER quality
    // (distinct tokens raise ttr) while doc 1 — the min-id cluster ROOT —
    // scores lower (repeated tokens). Doc 9 is unrelated.
    val common = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet meadow and birds sing in the old oak tree near " +
      "the river bank at dawn"
    val planted = Seq(
      (1L, s"$common the the the the the the"),
      (2L, s"$common quartz vixen jumbo glyph crisp ember"),
      (9L, "completely unrelated content about submarine volcanoes erupting " +
        "beneath the arctic shelf with plumes of mineral ash and the slow dark tide"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.quality(planted)
      .select(col("doc_id"), col("quality_score"), col("keep"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(q(1L)._2 && q(2L)._2 && q(9L)._2, "all planted docs must pass the gate")
    assert(q(2L)._1 > q(1L)._1, "doc 2 must outscore the root")
    // the two ARE one near-dup cluster
    val cl = Dedup.duplicateClusters(Dedup.nearDuplicates(planted, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.keySet === Set(1L, 2L) && cl.values.toSet === Set(1L))
    val root = Corpus.select(planted, 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val best = Corpus.selectBestPerCluster(planted, 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(root === Set(1L, 9L), "select keeps the id-ordered root")
    assert(best === Set(2L, 9L), "selectBestPerCluster keeps the best-quality member")
  }

  test("weightedSample: ∝-weight selection, reproducible, extreme weight always wins") {
    val sp = spark
    import sp.implicits._
    val rows = (1L to 400L).map(i => (i, if (i == 7L) 1000000L else 1L))
      .toDF("id", "w")
    // the one astronomically-heavy row is effectively certain to be drawn
    val got = Corpus.weightedSample(rows, col("id"), col("w"), 10, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(got.contains(7L))
    assert(got.size === 10)
    // pure function of (key, salt): same salt replays, new salt re-deals
    val again = Corpus.weightedSample(rows, col("id"), col("w"), 10, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(again === got)
    val other = Corpus.weightedSample(rows, col("id"), col("w"), 10, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(other !== got)
    // equal weights ≈ uniform: selection matches the rank of the raw draw
    val plan = Corpus.weightedSample(rows, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"cut must be local top-k:\n$plan")
  }

  test("perplexityBuckets: per-language terciles; fluent docs head, <2-token docs drop") {
    val out = Corpus.perplexityBuckets(docs)
    val rows = out.select("doc_id", "pred_lang", "bucket", "keep").collect()
    // docs with >= 2 tokens all appear exactly once
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // every language buckets against its OWN distribution: within each
    // predicted language the head/middle/tail counts are ~⅓ each
    // (whole-bucket landing can shift boundaries by one score bucket)
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      val nHead = rs.count(_.getString(2) == "head")
      val nTail = rs.count(_.getString(2) == "tail")
      if (n >= 10) {
        assert(nHead > 0 && nTail > 0, s"$lang: degenerate bucketing ($nHead head / $nTail tail of $n)")
        assert(nHead <= n * 2 / 3 && nTail <= n * 2 / 3, s"$lang: tercile wildly off")
      }
    }
    // keep <=> not tail
    assert(rows.forall(r => r.getBoolean(3) == (r.getString(2) != "tail")))
    // within a language, every head score >= every tail score (fluency ordering)
    val scored = out.select("pred_lang", "lm_logprob", "bucket").collect()
    byLang.keys.foreach { lang =>
      val hs = scored.filter(r => r.getString(0) == lang && r.getString(2) == "head").map(_.getDouble(1))
      val ts = scored.filter(r => r.getString(0) == lang && r.getString(2) == "tail").map(_.getDouble(1))
      if (hs.nonEmpty && ts.nonEmpty) assert(hs.min >= ts.max)
    }
  }

  test("dsirSelect: target-like raw docs outrank target-unlike; scores exact-integer ranked") {
    val sp = spark
    import sp.implicits._
    // target vocabulary {alpha beta}; raw pool: one doc written in the
    // target's vocabulary, one in a disjoint one — the target-like doc
    // must rank first with a strictly higher score
    val corpus = Seq(
      (1L, "alpha beta alpha beta", "tgt"),
      (2L, "alpha beta beta alpha", "tgt"),
      (10L, "alpha beta alpha", "raw"),
      (11L, "gamma delta gamma", "raw")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.dsirSelect(corpus, col("source") === "tgt", k = 2, buckets = 64)
      .select("doc_id", "n_tokens", "dsir_score").as[(Long, Long, Double)]
      .collect().sortBy(-_._3)
    assert(out.map(_._1).toSeq === Seq(10L, 11L))
    assert(out(0)._3 > out(1)._3, "target-vocabulary doc must score higher")
    assert(out(0)._2 === 3L && out(1)._2 === 3L)
    // k cuts the ranked list deterministically
    val top1 = Corpus.dsirSelect(corpus, col("source") === "tgt", k = 1, buckets = 64)
      .select("doc_id").as[Long].collect().toSeq
    assert(top1 === Seq(10L))
    // scale shape: the bucket-weight table must BROADCAST onto the
    // token stream (4096 rows vs 100 TB of tokens), and the ranked cut
    // must be a local top-k, never a global sort
    val plan = Corpus.dsirSelect(corpus, col("source") === "tgt", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weight table must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"ranked cut must be local top-k:\n$plan")
  }

  test("novelty: planted novel vs seen shingles score exactly") {
    val spark2 = spark
    import spark2.implicits._
    val ref = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // doc 1: both shingles seen in ref; doc 3: one of two shingles novel
    val nw = Seq(
      (1L, "alpha beta gamma delta"),
      (3L, "beta gamma delta zebra")).toDF("doc_id", "text")
    val out = Corpus.novelty(nw, ref)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((2L, 1L, 0.5)))
  }
}
