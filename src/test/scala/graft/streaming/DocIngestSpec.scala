package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Streaming document ingest: dedup-on-arrival within a run AND across
 *  restarts (state-store recovery from the checkpoint). */
class DocIngestSpec extends AnyFunSuite {

  test("dedup state persists across job restarts; first arrival wins") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_docingest")
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")

    def land(rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text").write.mode("append").parquet(src)

    land(1L -> "alpha beta", 2L -> "gamma delta")
    val schema = spark.read.parquet(src).schema
    DocIngest.run(spark, src, out, ckpt, schema).awaitTermination()

    // run 2: a normalized copy of doc 1 plus a new doc — the copy must be
    // rejected by state RECOVERED from the first run's checkpoint
    land(3L -> "  ALPHA   beta ", 4L -> "epsilon")
    DocIngest.run(spark, src, out, ckpt, schema).awaitTermination()

    val admitted = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 2L, 4L))
  }

  test("runPipeline: scrub-then-dedup collapses PII-only variants; gate drops junk") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_docpipe")
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    // two crawls of "the same page" differing ONLY in injected PII — raw
    // content hashes differ, redacted hashes agree; plus a doc that fails
    // the quality gate (< 8 tokens) and a clean survivor
    val keepable = "the same page content with a stopword and enough distinct tokens from"
    Seq(
      1L -> (keepable + " mail bob@a.io id 1234567"),
      2L -> (keepable + " mail eve@b.org id 7654321"),
      3L -> "too short to keep",
      4L -> (keepable + " nothing injected here")
    ).toDF("doc_id", "text").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    DocIngest.runPipeline(spark, src, out, ckpt, schema).awaitTermination()

    val lake = spark.read.parquet(out).collect()
    // 1 and 2 collapse to ONE admitted row (either may win the batch);
    // 3 is gated out; 4 survives → exactly two lake rows
    assert(lake.length === 2)
    val ids = lake.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(Set(1L, 2L)).size === 1)
    assert(ids.contains(4L))
    // the admitted variant's text is the redacted form
    val winner = lake.find(r => Set(1L, 2L)(r.getAs[Long]("doc_id"))).get
    assert(winner.getAs[String]("text") === (keepable + " mail <EMAIL> id <NUM>"))
  }

  test("runPipelineDecontam: reference content rejected (even as a PII variant); bloom fpp changes nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keepable = "the same page content with a stopword and enough distinct tokens from"
    val pageA = keepable + " about alpha systems and the design of them"
    val pageB = keepable + " about beta pipelines and the shape of them"
    val pageC = keepable + " about gamma clusters and the size of them"
    // the prior snapshot holds pages A and B (already-scrubbed output)
    val reference = Seq(10L -> pageA, 11L -> pageB).toDF("doc_id", "text")

    def runWith(expectedItems: Long): Set[Long] = {
      val base = java.nio.file.Files.createTempDirectory("graft_docdecon_spec")
      val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
      Seq(
        1L -> pageA,                                    // exact re-crawl of A → rejected
        2L -> (pageB + " mail eve@b.org id 7654321"),   // B plus injected PII → scrubs...
        3L -> pageC,                                    // genuinely new → admitted
        4L -> pageC,                                    // in-stream copy of C → deduped
        5L -> "too short to keep"                       // gate drop
      ).toDF("doc_id", "text").write.mode("append").parquet(src)
      val schema = spark.read.parquet(src).schema
      DocIngest.runPipelineDecontam(spark, src, out, ckpt, schema, reference,
        expectedItems = expectedItems).awaitTermination()
      spark.read.parquet(out).collect().map(_.getAs[Long]("doc_id")).toSet
    }

    val admitted = runWith(1 << 16)
    // doc 2 scrubs to pageB + " mail <EMAIL> id <NUM>" — DIFFERENT content
    // from reference B, so it's admitted (decontam keys on scrubbed
    // content equality, not similarity); A's re-crawl is rejected; one of
    // the C copies survives
    assert(admitted.intersect(Set(3L, 4L)).size === 1)
    assert(admitted.contains(2L))
    assert(!admitted.contains(1L) && !admitted.contains(5L))
    // a saturated 1-item bloom (near-100% fpp) forces every arrival
    // through the exact confirm join — the admitted set is identical
    val saturated = runWith(1L)
    assert(saturated.intersect(Set(3L, 4L)).size === 1)
    assert(saturated.contains(2L) && !saturated.contains(1L) && !saturated.contains(5L))
  }

  test("runPipelineNearDedup: reference near-dups rejected across batches; " +
      "admission is batch-independent (no within-stream near-dedup)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val page = "the quick brown fox jumps over the lazy dog while rain falls " +
      "on the quiet meadow and birds sing in the old oak tree near the river"
    val fresh = "completely different content about submarine volcanoes " +
      "erupting beneath the arctic shelf with plumes of mineral ash in the tide"
    val reference = Seq(100L -> page).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_nearadm_spec")
    // three SEPARATE source files × maxFilesPerTrigger=1 = three batches:
    // doc 1 (near-dup of the reference page — small tail edit) lands in a
    // different batch from doc 2 (another near-dup) and from docs 3/4
    // (mutual near-dups of each OTHER but not of the reference)
    Seq(1L -> (page + " at dawn today")).toDF("doc_id", "text")
      .write.parquet(s"$base/src/f1")
    Seq(2L -> (page + " at dusk tonight")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$base/src/f2")
    Seq(3L -> (fresh + " observed early"), 4L -> (fresh + " observed late"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$base/src/f3")
    // flatten: the file-stream source needs files in one dir
    val srcFlat = s"$base/srcflat"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcFlat))
    for (sub <- Seq("f1", "f2", "f3")) {
      val dir = java.nio.file.Paths.get(s"$base/src/$sub")
      val st = java.nio.file.Files.list(dir)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(p,
              java.nio.file.Paths.get(s"$srcFlat/${sub}_${p.getFileName}"))
        }
      } finally st.close()
    }
    val schema = spark.read.parquet(srcFlat).schema
    DocIngest.runPipelineNearDedup(spark, srcFlat, s"$base/out", s"$base/ckpt",
      s"$base/work", schema, reference, 0.5, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    val admitted = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // both reference near-dups rejected — in whichever batch they arrived;
    // both fresh docs admitted even though they near-dup EACH OTHER (the
    // documented no-new×new posture: within-crawl dedup is batch work)
    assert(admitted === Set(3L, 4L))
    // and the result equals the batch restatement
    val batchDup = graft.pipeline.Dedup.nearDuplicatesAgainstReference(
      spark.read.parquet(srcFlat), reference, 0.5)
      .select("new_id").collect().map(_.getLong(0)).toSet
    assert(batchDup === Set(1L, 2L))
  }
}
