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

  test("day-partitioned store: search prunes day partitions; ongoing outside the window is invisible (S10)") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val day = 86400L
    val t0 = 19700 * day
    val rows = Seq(
      (1L, t0 - 2 * day, t0 - 2 * day + 600, true), // ongoing, 2 days early → day-pruned away
      (2L, t0 - 600, t0 + 60, false), // previous day, but its END is in range → kept
      (3L, t0 + 100, t0 + 200, false), // squarely in range
      (4L, t0 + 2 * day, t0 + 2 * day + 10, false)) // after the window → pruned
    val docs = rows.toDF("event_id", "start_ts", "end_ts", "ongoing")
      .withColumn("namespace", lit("ns")).withColumn("source", lit("s"))
      .withColumn("title", lit("t")).withColumn("message", lit("m"))
      .withColumn("priority", lit("low"))
      .withColumn("dimensions", map(lit("host"), lit("web01")))
      .withColumn("day", date_format(to_timestamp(col("start_ts")), "yyyy-MM-dd"))
    val dir = java.nio.file.Files.createTempDirectory("graft_evday").toString
    EventsStore.append(docs, dir)
    val res = EventsEngine.search(EventsStore.log(spark, dir), EventsQuery(t0, t0 + day))
    assert(res.select("event_id").collect().map(_.getLong(0)).toSet === Set(2L, 3L))
    val plan = res.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*day""".r.findFirstIn(plan).isDefined,
      s"day conjunct must become a partition filter; plan was:\n$plan")
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

  test("purgeDays drops exactly the expired day partitions (events retention)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_purge").toString
    val rows = Seq(
      (1L, 1L, "a", false, "2024-01-01"),
      (2L, 1L, "b", false, "2024-01-02"),
      (3L, 1L, "c", false, "2024-01-03"))
      .toDF("doc_id", "version", "title", "ongoing", "day")
    EventsStore.append(rows, dir)
    val dropped = EventsStore.purgeDays(dir, cutoffDay = "2024-01-03")
    assert(dropped === Seq("2024-01-01", "2024-01-02"))
    val left = EventsStore.log(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(left === Set(3L))
    // idempotent
    assert(EventsStore.purgeDays(dir, cutoffDay = "2024-01-03") === Seq.empty)
  }
}
