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
}
