package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Dedup operator semantics on hand-built corpora. */
class DedupSpec extends AnyFunSuite {

  private def docsOf(texts: (Long, String)*): DataFrame = {
    val spark = TestSpark.spark
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("duplicateSpans: cross-doc shared runs at window granularity") {
    val shared = (1 to 16).map(i => s"s$i").mkString(" ")
    val pad8 = (1 to 8).map(i => s"h$i").mkString(" ")
    val df = docsOf(
      1L -> (shared + " t1 t2"),     // shared at stride-aligned start 0
      2L -> (pad8 + " " + shared),   // shared at stride-aligned start 8
      3L -> "too short for any span")
    val out = Dedup.duplicateSpans(df, 16, 8).collect()
    // exactly one duplicated span group: the shared 16-token run
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_occurrences") === 2L)
    assert(out(0).getAs[Long]("n_docs") === 2L)
    assert(out(0).getAs[Long]("canonical_id") === 1L)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(shared.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("span_fp") === md5hex)

    // the stride contract: a run at an UNALIGNED offset is invisible at
    // stride 8 but found at stride 1 (Lee et al.'s suffix-array pass is
    // the stride-1 limit)
    val pad3 = "x1 x2 x3"
    val df2 = docsOf(1L -> (shared + " t1 t2"), 2L -> (pad3 + " " + shared))
    assert(Dedup.duplicateSpans(df2, 16, 8).collect().isEmpty)
    val fine = Dedup.duplicateSpans(df2, 16, 1).collect()
    assert(fine.exists(_.getAs[String]("span_fp") == md5hex))
  }

  test("exact dedup groups whitespace/case variants") {
    val df = docsOf(
      1L -> base,
      2L -> base.toUpperCase,
      3L -> ("  " + base.replace(" ", "   ") + " "),
      4L -> "something entirely different here")
    val groups = Dedup.exact(df).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap // canonical -> copies
    assert(groups === Map(1L -> 3L, 4L -> 1L))
  }

  test("identical docs have identical MinHash signatures; est Jaccard 1.0") {
    val df = docsOf(1L -> base, 2L -> base)
    val pairs = Dedup.nearDuplicates(df, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("near-duplicates are caught, unrelated docs are not candidates") {
    val perturbed = base.replace("dog", "cat")
    val df = docsOf(
      1L -> base, 2L -> perturbed,
      3L -> "completely unrelated words about query engines and columnar storage systems")
    val cands = Dedup.candidates(df).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), "perturbed copy must share an LSH band")
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
    val near = Dedup.nearDuplicates(df, 0.3).collect()
    assert(near.length === 1 && near(0).getDouble(2) >= 0.3)
  }

  test("exact n-gram Jaccard refines LSH candidates") {
    val df = docsOf(1L -> base, 2L -> base.replace("dog", "cat"))
    val out = Dedup.ngramJaccard(df, 0.1).collect()
    assert(out.length === 1)
    val j = out(0).getDouble(2)
    // 13 tokens → 11 trigrams; "dog" appears in 3 of them
    assert(j > 0.5 && j < 1.0)
    // a cap wider than any band bucket degenerates to the exhaustive
    // path bit-for-bit (the capped-variant contract); a 1-wide cap
    // drops every multi-member bucket and with it the only pair
    val capped = Dedup.ngramJaccard(df, 0.1, maxBucketSize = 1000).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    assert(Dedup.ngramJaccard(df, 0.1, maxBucketSize = 1).count() === 0)
  }

  test("SimHash collides for identical docs and separates unrelated ones") {
    val df = docsOf(1L -> base, 2L -> base, 3L -> "other totally distinct content stream")
    val buckets = Dedup.simhashBuckets(df).collect()
    assert(buckets.length === 1)
    assert(buckets(0).getLong(1) === 2L) // the two identical docs
  }

  test("simhashNearDuplicates: identical docs at distance 0; every pair verified <= radius") {
    val docs = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta", // identical
      3L -> "alpha beta gamma delta epsilon zeta eta iota", // one word off
      4L -> "totally different words about completely other things here now")
    val out = graft.pipeline.Dedup.simhashNearDuplicates(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) === 0L, "identical docs must pair at distance 0")
    assert(out.values.forall(_ <= 3L))
    // ground truth: recompute pairwise simhash distances exactly
    val hashes = graft.pipeline.TextAnalysis.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a, b) -> d.toLong).toMap
    assert(out === expect, "block-collision candidates must recall every pair within the radius")
  }

  test("signature arithmetic stays within safe 64-bit bounds") {
    // max h is 2^28-1; max coefficient < P < 2^31 ⇒ product < 2^59
    assert(HashConstants.PermA.forall(a => a > 0 && a < HashConstants.P))
    assert(HashConstants.PermB.forall(b => b >= 0 && b < HashConstants.P))
    assert(HashConstants.PermA.distinct.length === HashConstants.NumPerms)
  }

  test("relational shingleRows equals the HOF shingles column form") {
    import org.apache.spark.sql.functions._
    val df = docsOf(1L -> base, 2L -> "alpha beta gamma delta", 3L -> "x y z")
    val viaRows = Dedup.shingleRows(df).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val viaColumn = df
      .filter(size(graft.pipeline.TextAnalysis.tokens(col("text"))) >= 3)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaRows === viaColumn)
    assert(viaRows.count(_._1 == 3L) === 1) // exactly one trigram for 3 tokens
  }

  test("bucket-size cap defuses the clone-cluster LSH degeneracy") {
    val clones = (1L to 30L).map(_ -> base)
    val df = docsOf(clones :+ (99L -> base.replace("dog", "cat")): _*)
    // uncapped: the 30-clone bucket alone yields 435 pairs
    assert(Dedup.candidates(df).count() >= 435)
    // capped at 10: the clone bucket is dropped, the near-dup pair with
    // doc 99 survives only if its bucket is small — here everything
    // shares the clone bucket, so candidates collapse
    assert(Dedup.candidates(df, maxBucketSize = 10).count() === 0)
    // exact dedup still finds the clones trivially
    val ex = Dedup.exact(df).filter(org.apache.spark.sql.functions.col("n_copies") >= 2).collect()
    assert(ex.length === 1 && ex(0).getLong(2) === 30L)
  }

  test("duplicateClusters: transitive chain collapses to one component, min id wins") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // A~B, B~C chain (near-dup is not transitive: A,C need not pair) plus
    // an independent D~E pair and a lone pair member F~G
    val pairs = Seq(
      (10L, 20L, 0.9), (20L, 30L, 0.8), // chain 10-20-30
      (40L, 50L, 0.7), // pair
      (70L, 60L, 0.6)  // reversed input order: min label still wins
    ).toDF("doc_a", "doc_b", "est_jaccard")
    val out = graft.pipeline.Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L,
      60L -> 60L, 70L -> 60L))
  }

  test("duplicateClusters equals brute-force components on random graphs (property)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- org.scalacheck.Gen.choose(2, 10)
      m <- org.scalacheck.Gen.choose(1, 12)
      edges <- org.scalacheck.Gen.listOfN(m, org.scalacheck.Gen.zip(
        org.scalacheck.Gen.choose(0L, n.toLong), org.scalacheck.Gen.choose(0L, n.toLong)))
    } yield edges.filter(e => e._1 != e._2)
    val seed0 = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed0)(_.next).take(8).foreach { seed =>
      gen.apply(org.scalacheck.Gen.Parameters.default, seed).foreach { edges =>
        if (edges.nonEmpty) {
          // brute-force union-find
          val parent = scala.collection.mutable.Map.empty[Long, Long]
          def find(x: Long): Long = {
            val p = parent.getOrElseUpdate(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          edges.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val want = parent.keys.map(d => d -> find(d)).toMap
          val got = graft.pipeline.Dedup.duplicateClusters(
              edges.toDF("doc_a", "doc_b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got === want, s"edges=$edges")
        }
      }
    }
  }

  test("duplicateClusters on an empty pair set returns an empty mapping (clean corpus)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.pipeline.Dedup.duplicateClusters(none).count() === 0)
  }

  test("duplicateClusters survives a long chain (checkpointed lineage + doubling rounds)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // a path 0-1-2-…-24: diameter 24 forces > 8 rounds — without lineage
    // truncation the per-round plan doubles and analysis blows up; with
    // doubling past round 8 the remaining distance halves per round.
    // maxDriverEdges = 0 forces the DISTRIBUTED loop (the driver
    // union-find would otherwise absorb a graph this small).
    val chain = (0L until 24L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.pipeline.Dedup.duplicateClusters(chain, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 25)
    assert(labels.values.forall(_ === 0L))
  }

  test("driver union-find and distributed propagation agree; distributed loop honors a checkpoint dir") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val edges = Seq((3L, 9L), (9L, 4L), (12L, 11L), (4L, 1L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val viaDriver = graft.pipeline.Dedup.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reliable checkpoints: once the context has a checkpoint dir, the
    // distributed loop's lineage truncation must write there (executor-
    // loss-safe at warehouse scale) and labels must be unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val viaLoop = graft.pipeline.Dedup.duplicateClusters(edges, maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaLoop === viaDriver)
      assert(viaLoop === Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L,
        11L -> 11L, 12L -> 11L, 20L -> 20L, 21L -> 20L))
      val written = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => p.getFileName.toString.startsWith("rdd-"))
      assert(written > 0, "reliable checkpoint directories must be written under the checkpoint dir")
    } finally {
      // the shared TestSpark session outlives this test: without a reset,
      // every later Iterate.truncate silently switches from
      // localCheckpoint to reliable checkpoints in this temp dir
      // (test-order-dependent behavior). SparkContext has no public
      // unset, so restore the private Option field directly.
      spark.sparkContext.getClass
        .getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(spark.sparkContext, None)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }

  test("capped SimHash near-dup: clone cluster survives as O(n) star edges, not |bucket|^2 pairs") {
    val clones = (1L to 30L).map(_ -> base)
    val other = Seq(
      200L -> "solar panels convert sunlight into usable electric power daily",
      201L -> "solar panels convert sunlight into usable electric current daily", // near dup of 200
      300L -> "完全 different unrelated topic with nothing shared at all whatsoever")
    val df = docsOf(clones ++ other: _*)
    // uncapped: the 30-clone bucket alone materializes 435 in-radius pairs
    assert(Dedup.simhashNearDuplicates(df, 3).count() >= 435)
    val capped = Dedup.simhashNearDuplicatesCapped(df, 3, maxBucketSize = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // clone cluster: exactly the 29 star edges (canonical 1 -> each clone)
    val starEdges = (2L to 30L).map(b => (1L, b)).toSet
    val cloneEdges = capped.keySet.filter(_._2 <= 30L)
    assert(cloneEdges === starEdges, "cap must trade |bucket|^2 pairs for the star")
    assert(starEdges.forall(e => capped(e) === 0L))
    // a genuine near-dup pair OUTSIDE any degenerate bucket still pairs
    // through the capped LSH path (its buckets are size <= 2)
    assert(capped.contains((200L, 201L)), "small-bucket near-dups must survive the cap")
    // collapse: the 30 clones become ONE component keeping doc 1
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val labels = Dedup.duplicateClusters(
        Dedup.simhashNearDuplicatesCapped(df, 3, 10).select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 30L).forall(labels(_) === 1L))
  }

  test("exactStreaming: first arrival wins across micro-batches") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.pipeline.Dedup.exactStreaming(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(1L -> "alpha beta", 2L -> "gamma delta")
      q.processAllAvailable()
      // 3 normalizes to doc 1's content (whitespace/case) → dropped; 4 is new
      input.addData(3L -> "  Alpha   BETA ", 4L -> "epsilon zeta")
      q.processAllAvailable()
      val ids = spark.table("stream_dedup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L))
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS stream_dedup") }
  }

  test("minhashEval: confusion counts reconstructed from the independent est/exact operators") {
    import org.apache.spark.sql.functions._
    // clones (both metrics agree high), a partial overlap (borderline),
    // and unrelated docs
    val d = docsOf(
      1L -> (base + " one two three four five six seven"),
      2L -> (base + " one two three four five six seven"),
      3L -> (base + " something rather different here instead now maybe"),
      4L -> "entirely unrelated words about glaciers calving into a grey sea at night",
      5L -> "entirely unrelated words about glaciers calving into a grey sea at dawn")
    val t = 0.5
    val eval = Dedup.minhashEval(d, t).collect().head
    // independent reconstruction: est from nearDuplicates(0) (all
    // candidate pairs), exact from ngramJaccard(0) (same pair set)
    val est = Dedup.nearDuplicates(d, 0.0)
      .select("doc_a", "doc_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.ngramJaccard(d, 0.0)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.keySet === exact.keySet && est.nonEmpty)
    def n(f: ((Long, Long)) => Boolean) = est.keys.count(f)
    assert(eval.getAs[Long]("tp") === n(k => est(k) >= t && exact(k) >= t))
    assert(eval.getAs[Long]("fp") === n(k => est(k) >= t && exact(k) < t))
    assert(eval.getAs[Long]("fn") === n(k => est(k) < t && exact(k) >= t))
    assert(eval.getAs[Long]("tn") === n(k => est(k) < t && exact(k) < t))
    val counts = Seq("tp", "fp", "fn", "tn").map(eval.getAs[Long](_)).sum
    assert(counts === est.size)
    val mae = est.keys.map(k =>
      BigDecimal(math.abs(est(k) - exact(k))).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).sum / est.size
    assert(math.abs(eval.getAs[Double]("mean_abs_err") -
      BigDecimal(mae).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("minhashEval: collision-free corpus reports the zero confusion matrix, not nulls") {
    // no shingle overlap at all → zero band collisions → zero candidate
    // pairs; the one-row report must still be well-defined
    val d = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten eleven twelve")
    val eval = Dedup.minhashEval(d, 0.5).collect().head
    for (c <- Seq("tp", "fp", "fn", "tn")) assert(eval.getAs[Long](c) === 0L)
    // no pairs → no error to average: explicitly null, never 0.0
    assert(eval.isNullAt(eval.fieldIndex("mean_abs_err")))
  }

  test("nearDuplicatesAgainstReference: cross-set pairs only, estimates match the union pipeline") {
    val a = base + " one"
    val aVar = base + " two"            // near-dup of a (one token differs)
    val bNew1 = base + " alpha beta gamma delta"
    val bNew2 = base + " alpha beta gamma epsilon" // near-dup WITHIN new
    val refDf = docsOf(100L -> a, 101L -> "completely different words entirely unrelated text here today")
    val nwDf = docsOf(1L -> aVar, 2L -> bNew1, 3L -> bNew2)
    val out = Dedup.nearDuplicatesAgainstReference(nwDf, refDf, 0.5).collect()
    // exactly the cross pair (1 ↔ 100); the new×new near-dup (2, 3) must NOT appear
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 100L)))
    // the estimate is bit-identical to the union-corpus pipeline's
    val union = Dedup.nearDuplicates(
      nwDf.unionByName(refDf), 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.head.getDouble(2) === union((1L, 100L)))
    // a clone flood on the new side degenerates every shared bucket; the
    // joint cap drops those buckets whole, leaving no pairs
    val flood = docsOf((10L to 40L).map(i => i -> a): _*)
    val capped = Dedup.nearDuplicatesAgainstReference(flood, refDf, 0.5, maxBucketSize = 10)
    assert(capped.count() === 0L)
    // cap off, the flood pairs with its reference original
    val uncapped = Dedup.nearDuplicatesAgainstReference(flood, refDf, 0.5)
    assert(uncapped.select("ref_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(100L))
    assert(uncapped.count() === 31L)
  }

  test("dedupAgainstReference property: equals the plain anti-join on random corpora at random bloom sizes") {
    import org.scalacheck.Gen
    // tiny alphabet forces frequent cross-set collisions; whitespace/case
    // variants exercise the normalization layer
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val text = for {
      n <- Gen.choose(1, 4)
      ws <- Gen.listOfN(n, word)
      pad <- Gen.oneOf("", "  ")
      up <- Gen.oneOf(true, false)
    } yield { val t = ws.mkString(" "); pad + (if (up) t.toUpperCase else t) }
    val corpus = for {
      nRef <- Gen.choose(0, 8)
      nNew <- Gen.choose(1, 8)
      ref <- Gen.listOfN(nRef, text)
      nw <- Gen.listOfN(nNew, text)
      est <- Gen.oneOf(1L, 16L, 1L << 12)
    } yield (ref, nw, est)
    val seed0 = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed0)(_.next).take(12).foreach { seed =>
      corpus.apply(Gen.Parameters.default, seed).foreach { case (ref, nw, est) =>
        val refDf = docsOf(ref.zipWithIndex.map { case (t, i) => (100L + i) -> t }: _*)
        val nwDf = docsOf(nw.zipWithIndex.map { case (t, i) => i.toLong -> t }: _*)
        val got = Dedup.dedupAgainstReference(nwDf, refDf, est)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val refNorms = ref.map(_.trim.toLowerCase.replaceAll("\\s+", " ")).toSet
        val expect = nw.zipWithIndex.collect {
          case (t, i) if !refNorms(t.trim.toLowerCase.replaceAll("\\s+", " ")) => i.toLong
        }.toSet
        assert(got === expect, s"ref=$ref new=$nw est=$est")
      }
    }
  }

  test("dedupAgainstReference: exact anti-join result, independent of bloom fpp; reference never shuffles") {
    val ref = docsOf(
      1L -> "alpha beta gamma",
      2L -> "delta epsilon zeta",
      3L -> "eta theta iota")
    val nw = docsOf(
      10L -> "alpha beta gamma",      // exact clone of ref 1 → removed
      11L -> "brand new page one",
      12L -> "  DELTA epsilon   ZETA ", // normalizes to ref 2 → removed
      13L -> "another brand new page")
    def ids(df: DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val out = Dedup.dedupAgainstReference(nw, ref)
    assert(ids(out) === Seq(11L, 13L))
    // a degenerate 1-item bloom saturates (near-100% fpp): every
    // reference hash survives the prefilter, and the anti join still
    // yields the identical result — fpp tunes cost, never correctness
    assert(ids(Dedup.dedupAgainstReference(nw, ref, expectedItems = 1L)) === Seq(11L, 13L))
    // empty new snapshot short-circuits
    assert(Dedup.dedupAgainstReference(nw.limit(0), ref).count() === 0L)
    // plan shape: the reference side is reduced by a map-side
    // might_contain filter and meets the new side in a broadcast anti
    // join — no exchange anywhere on the reference branch. Asserted over
    // parquet inputs (ConvertToLocalRelation folds filters over local
    // fixtures away at optimization time, hiding the shape).
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup")
    nw.write.parquet(s"$dir/new"); ref.write.parquet(s"$dir/ref")
    val outP = Dedup.dedupAgainstReference(
      spark.read.parquet(s"$dir/new"), spark.read.parquet(s"$dir/ref"))
    assert(ids(outP) === Seq(11L, 13L))
    val plan = outP.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prefilter must reach the physical plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "anti join must be broadcast, never a shuffle of either side")
    // shuffle nodes print as "Exchange hashpartitioning(...)"; the only
    // Exchange here must be the broadcast (HashedRelationBroadcastMode)
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      "neither branch may shuffle: reference is map-side filtered, new is broadcast-anti-joined")
  }

  test("bandingPlan: S-curve monotone; s50 is the true 50% crossing, not the MMDS approx") {
    val spark = TestSpark.spark
    val rows = Dedup.bandingPlan(spark).orderBy("s").collect()
    assert(rows.length === 19)
    val ps = rows.map(_.getAs[Double]("p_candidate"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "S-curve must be monotone in s")
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the 8-band x 4-row default: MMDS threshold approx (1/8)^(1/4) =
    // 0.5946 — the steepest-slope point, where P = 1-(1-1/b)^b = 0.6564,
    // NOT 50%; the true 50% crossing is (1 - 2^(-1/8))^(1/4) = 0.5370
    assert(rows.head.getAs[Double]("threshold_approx") === r4(math.pow(1.0 / 8, 1.0 / 4)))
    val s50 = rows.head.getAs[Double]("s50")
    assert(s50 === r4(math.pow(1.0 - math.pow(2.0, -1.0 / 8), 1.0 / 4)))
    assert(s50 < rows.head.getAs[Double]("threshold_approx"),
      "for b=8/r=4 the 50% crossing sits below the steepest-slope approx")
    // grid points straddling s50 = 0.5370: P < 0.5 at 0.50, > 0.5 at 0.55
    val byS = rows.map(r => r.getAs[Double]("s") -> r.getAs[Double]("p_candidate")).toMap
    assert(byS(0.5) < 0.5 && byS(0.55) > 0.5,
      s"curve must cross 50% between 0.50 and 0.55 (s50=$s50), got ${byS(0.5)} / ${byS(0.55)}")
    // near-zero at low similarity, near-one at high: the filtering the
    // banding is FOR
    assert(byS(0.2) < 0.02 && byS(0.95) > 0.999)
  }
  test("shared signature+count aggregate equals the two-pass form (round 16)") {
    // ngramJaccard/minhashEval now take per-doc shingle totals out of the
    // SAME hash aggregate as the MinHash minima; pin bit-equality with
    // the independent two-pass computation it replaced
    val docs = docsOf(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy cat again and again",
      3L -> "completely unrelated text with several distinct words inside here")
    val expl = Dedup.shingleRows(docs)
    val fused = Dedup.signaturesAndCountsFromShingles(expl)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val sigs = Dedup.signaturesFromShingles(expl)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val counts = expl.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.keySet === sigs.keySet)
    fused.foreach { case (d, (sig, n)) =>
      assert(sig === sigs(d)); assert(n === counts(d))
    }
  }
}
