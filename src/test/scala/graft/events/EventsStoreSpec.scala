package graft.events

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Upsert / ongoing / parent-child semantics of the events store (S9, R7). */
class EventsStoreSpec extends AnyFunSuite {

  private def doc(id: Long, version: Long, title: String, ongoing: Boolean,
      parent: Option[Long] = None) = (id, version, title, ongoing, parent)

  private def toDf(rows: (Long, Long, String, Boolean, Option[Long])*) = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "version", "title", "ongoing", "parent_id")
  }

  test("re-indexing the same doc id updates it; latest version wins") {
    val log = toDf(
      doc(1, 1, "incident open", ongoing = true),
      doc(1, 2, "incident update", ongoing = true),
      doc(1, 3, "incident closed", ongoing = false),
      doc(2, 1, "other", ongoing = false))
    val cur = EventsStore.current(log).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(cur === Map(1L -> (("incident closed", false)), 2L -> (("other", false))))
  }

  test("append + log round-trips through parquet; compact keeps one version") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    EventsStore.append(toDf(doc(1, 1, "v1", ongoing = true)), dir)
    EventsStore.append(toDf(doc(1, 2, "v2", ongoing = false), doc(3, 1, "x", ongoing = false)), dir)
    assert(EventsStore.log(spark, dir).count() === 3)
    val cur = EventsStore.current(EventsStore.log(spark, dir))
    assert(cur.count() === 2)
    EventsStore.compact(spark, dir)
    assert(EventsStore.log(spark, dir).count() === 2)
    val after = EventsStore.current(EventsStore.log(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after === Map(1L -> "v2", 3L -> "x"))
  }

  test("children link to parents; parents count their children") {
    val cur = EventsStore.current(toDf(
      doc(10, 1, "parent", ongoing = false),
      doc(11, 1, "child a", ongoing = false, parent = Some(10)),
      doc(12, 1, "child b", ongoing = false, parent = Some(10)),
      doc(13, 1, "loner", ongoing = false)))
    val linked = EventsStore.withChildren(cur).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_children")).toMap
    assert(linked === Map(10L -> 2L, 11L -> 0L, 12L -> 0L, 13L -> 0L))
    val kids = EventsStore.withChildren(cur)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 10)
      .head.getAs[scala.collection.Seq[Long]]("child_ids")
    assert(kids.toSeq === Seq(11L, 12L))
  }
}
