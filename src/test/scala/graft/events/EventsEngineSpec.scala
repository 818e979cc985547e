package graft.events

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Events query semantics (reference QueryRunner / LuceneQueryBuilder
 *  scenarios on a hand-built doc fixture). */
class EventsEngineSpec extends AnyFunSuite {

  private def docs: DataFrame = {
    val spark = TestSpark.spark
    import spark.implicits._
    // (event_id, namespace, source, title, message, priority, start, end, ongoing, dim host)
    Seq(
      (1L, "alert", "srcA", "cpu high", "cpu over limit", "high", 100L, 200L, false, "web01"),
      (2L, "alert", "srcB", "disk full", "disk usage high", "low", 150L, 150L, false, "web02"),
      (3L, "deploy", "srcA", "release v2", "rolled out", "med", 300L, 400L, false, "web01"),
      (4L, "alert", "srcA", "mem leak", "memory climbing", "high", 500L, 900L, true, "web01"),
      (5L, "deploy", "srcB", "release v3", "hotfix out", "med", 950L, 960L, false, "web02"))
      .toDF("event_id", "namespace", "source", "title", "message", "priority",
        "start_ts", "end_ts", "ongoing", "h")
      .selectExpr("event_id", "namespace", "source", "title", "message", "priority",
        "start_ts", "end_ts", "ongoing", "map('host', h) AS dimensions")
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("term → contains-regex conversion (reference convertToRegex)") {
    assert(EventsEngine.termToRegex("cpu") === "cpu")
    assert(EventsEngine.termToRegex("re*out") === "re.*out")
  }

  test("multi-term text search ANDs terms across fields") {
    assert(ids(EventsEngine.search(docs, EventsQuery(0, 1000, text = Some("high")))) ===
      Set(1L, 2L, 4L)) // matches message or priority
    assert(ids(EventsEngine.search(docs, EventsQuery(0, 1000, text = Some("high cpu")))) ===
      Set(1L)) // both terms must match somewhere
    assert(ids(EventsEngine.search(docs, EventsQuery(0, 1000, text = Some("release v*")))) ===
      Set(3L, 5L))
  }

  test("time clause: start-in-range OR end-in-range OR ongoing (F12)") {
    // window [350, 450): event 3 matches only via its end_ts; 4 via ongoing
    assert(ids(EventsEngine.search(docs, EventsQuery(350, 450))) === Set(3L, 4L))
    // namespace conjunct
    assert(ids(EventsEngine.search(docs, EventsQuery(0, 1000, namespace = Some("deploy")))) ===
      Set(3L, 5L))
    // dimension equality conjunct
    assert(ids(EventsEngine.search(docs,
      EventsQuery(0, 1000, dims = Map("host" -> "web02")))) === Set(2L, 5L))
  }

  test("paging is newest-first with deterministic offsets (T1)") {
    val q = EventsQuery(0, 1000)
    val page0 = EventsEngine.page(docs, q, 0, 2).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    val page1 = EventsEngine.page(docs, q, 2, 2).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(page0 === Seq(5L, 4L))
    assert(page1 === Seq(3L, 2L))
  }

  test("JSON paging over a multi-day store replays the per-index budget walk (T1)") {
    // Reference shape (events-lucene QueryRunner.java:99-131): one Lucene
    // index per day, each searched sorted start-desc with a from+size
    // budget; index responses are walked NEWEST-DAY-FIRST, the global
    // size budget decrementing per day and cutting inside the first day
    // that overruns it. An event's index day IS its start day, so the
    // cross-index concatenation must equal a single global
    // (start_ts desc, event_id desc) sort — this spec pins that
    // equivalence on a 4-day store where pages straddle day boundaries.
    val spark = TestSpark.spark
    import spark.implicits._
    val day = 86400L
    // 4 days × uneven counts (3/4/5/2), start times interleaved so the
    // global sort would shuffle days if the day walk were wrong
    val rows = for {
      (d, n) <- Seq((0, 3), (1, 4), (2, 5), (3, 2))
      i <- 0 until n
    } yield {
      val start = (d + 10) * day + i * 137L
      ((d * 10 + i).toLong, "alert", "src", s"t$d-$i", "m", "low",
        start, start + 10L, false)
    }
    val store = rows.toDF("event_id", "namespace", "source", "title", "message",
        "priority", "start_ts", "end_ts", "ongoing")
      .selectExpr("*", "map('host', 'h') AS dimensions",
        "date_format(to_timestamp(start_ts), 'yyyy-MM-dd') AS day")

    // the reference walk, simulated literally: per-day desc-sorted lists,
    // days newest-first, budget decremented day by day
    val perDay = rows.groupBy(_._7 / day).toSeq.sortBy(-_._1)
      .map(_._2.sortBy(r => (-r._7, -r._1)).map(_._1))
    val walk = perDay.flatten // newest day first, desc within day

    def jsonPage(from: Int, size: Int): Seq[Long] = {
      val r = graft.query.TsdbJson.parseEventsRequest(
        s"""{"start": 0, "end": ${20 * day}, "namespace": "alert",
             "from": $from, "size": $size}""")
      EventsEngine.run(store, r).select("event_id").collect().map(_.getLong(0)).toSeq
    }
    // budget cuts inside day 2 of the walk (2 + 5 = 7 events in the two
    // newest days; size 6 part-consumes the second index)
    assert(jsonPage(0, 6) === walk.slice(0, 6))
    // offset skips the whole newest index and lands mid-day
    assert(jsonPage(3, 5) === walk.slice(3, 8))
    // page spanning three indices
    assert(jsonPage(1, 10) === walk.slice(1, 11))
    // overrunning budget returns everything left
    assert(jsonPage(9, 99) === walk.slice(9, walk.length))
  }

  test("group-by with hit counts and fetch-last (A16)") {
    val grouped = EventsEngine.group(docs, EventsQuery(0, 1000), "host", fetchLast = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // web01: 3 hits, latest event 4; web02: 2 hits, latest event 5
    assert(grouped === Map("web01" -> (3L, 4L), "web02" -> (2L, 5L)))
  }

  test("top-1 per group (W6)") {
    assert(ids(EventsEngine.topOnePerGroup(docs, EventsQuery(0, 1000), "host")) ===
      Set(4L, 5L))
  }

  test("per-minute downsample (A17)") {
    val buckets = EventsEngine.downsample(docs, EventsQuery(0, 1000))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets === Map(60L -> 1L, 120L -> 1L, 300L -> 1L, 480L -> 1L, 900L -> 1L))
  }

  test("attribute stats: JSON field extraction, sparse coverage, exact sums") {
    val spark = TestSpark.spark
    import spark.implicits._
    // payloads: two carrying k, one other field, one malformed
    val d = Seq(
      (1L, "alert", """{"k": 7}""", 100L),
      (2L, "alert", """{"k": 35, "other": 1}""", 150L),
      (3L, "alert", """{"other": 2}""", 200L),
      (4L, "deploy", """not json""", 300L))
      .toDF("event_id", "namespace", "message", "start_ts")
      .selectExpr("event_id", "namespace", "'s' AS source", "'t' AS title", "message",
        "'low' AS priority", "start_ts", "start_ts AS end_ts", "false AS ongoing",
        "map('host', 'w') AS dimensions")
    val out = EventsEngine.attributeStats(d, EventsQuery(0, 1000), "k")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toMap
    // alert: 3 hits, 2 with the field, sum 42, max 35
    assert(out("alert") === ((3L, 2L, Some(42L), Some(35L))))
    // deploy: field absent everywhere → NULL aggregates, honest zero coverage
    assert(out("deploy") === ((1L, 0L, None, None)))
    // JSON-path metacharacters would silently extract nothing — rejected
    for (bad <- Seq("a.b", "a[0]", "a'b", "", "a b"))
      intercept[IllegalArgumentException] {
        EventsEngine.attributeStats(d, EventsQuery(0, 1000), bad)
      }
  }
}
