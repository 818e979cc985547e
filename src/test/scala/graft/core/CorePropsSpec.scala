package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the identity / interval primitives (plain
 *  scalacheck generators driven by a sampling loop — no scalatestplus
 *  bridge needed offline). */
class CorePropsSpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 30)(f: T => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  test("Intervals.toSeconds parses the full grammar") {
    assert(Intervals.toSeconds("5s") === 5)
    assert(Intervals.toSeconds("1m") === 60)
    assert(Intervals.toSeconds("90m") === 5400)
    assert(Intervals.toSeconds("2h") === 7200)
    assert(Intervals.toSeconds("1d") === 86400)
    assert(Intervals.toSeconds("1w") === 604800)
    assert(Intervals.toSeconds("0all") === -1)
    assertThrows[IllegalArgumentException](Intervals.toSeconds("5x"))
    // "auto" must resolve via autoInterval BEFORE reaching toSeconds —
    // an unresolved leak through run() fails loudly, not as hours
    assertThrows[IllegalArgumentException](Intervals.toSeconds("auto"))
  }

  test("Intervals.autoInterval picks the ladder rung at every boundary") {
    // below the lowest rung → the 1m floor
    assert(Intervals.autoInterval(0) === "1m")
    assert(Intervals.autoInterval(3599) === "1m")
    // each rung activates AT its threshold (>=) and holds to the next
    assert(Intervals.autoInterval(3600) === "5m")
    assert(Intervals.autoInterval(6 * 3600 - 1) === "5m")
    assert(Intervals.autoInterval(6 * 3600) === "15m")
    assert(Intervals.autoInterval(86400 - 1) === "15m")
    assert(Intervals.autoInterval(86400) === "1h")
    assert(Intervals.autoInterval(3 * 86400 - 1) === "1h")
    assert(Intervals.autoInterval(3 * 86400) === "6h")
    assert(Intervals.autoInterval(14 * 86400 - 1) === "6h")
    assert(Intervals.autoInterval(14 * 86400) === "1d")
    // the declared q_ds_auto range (20 days) lands on the 1d rung —
    // the premise of sharing q_ds_sum's oracle verbatim
    assert(Intervals.autoInterval(20 * 86400) === "1d")
    assertThrows[IllegalArgumentException](Intervals.toSeconds(""))
  }

  test("Intervals.toSeconds is linear in the count (property)") {
    val units = Map("s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L, "w" -> 604800L)
    forAll(Gen.choose(1, 10000), Gen.oneOf(units.keys.toSeq)) { (n: Int, u: String) =>
      assert(Intervals.toSeconds(s"$n$u") === n.toLong * units(u))
    }
  }

  test("canonicalTags is injective over distinct tag maps (property)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val genKV = for {
      k <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
      v <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(5))
    } yield k -> v
    val genTags = Gen.mapOf(genKV).map(_.take(6)).suchThat(_.nonEmpty)
    forAll(Gen.listOfN(8, genTags)) { maps =>
      val distinctMaps = maps.distinct
      val canon = distinctMaps.toDF("tags")
        .select(SeriesId.canonicalTags(col("tags"))).collect().map(_.getString(0))
      assert(canon.distinct.length === distinctMaps.length,
        "distinct tag maps must canonicalize to distinct strings")
    }
  }

  test("canonicalTags is order-insensitive") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = Seq(Map("b" -> "2", "a" -> "1", "c" -> "3")).toDF("tags")
      .select(SeriesId.canonicalTags(col("tags"))).head.getString(0)
    val b = Seq(Map("c" -> "3", "a" -> "1", "b" -> "2")).toDF("tags")
      .select(SeriesId.canonicalTags(col("tags"))).head.getString(0)
    assert(a === b)
    assert(a === "a\u00001\u0000b\u00002\u0000c\u00003")
  }

  test("segmentStart floors to the segment window (property)") {
    val spark = TestSpark.spark
    import spark.implicits._
    forAll(Gen.choose(0L, 4102444800L)) { ts =>
      val seg = Seq(ts).toDF("ts").select(SeriesId.segmentStart(col("ts")))
        .head.getLong(0)
      assert(seg % TsdbSchema.SegmentSeconds === 0)
      assert(seg <= ts && ts - seg < TsdbSchema.SegmentSeconds)
    }
  }

  test("seriesId is stable across ingest and query (same inputs, same id)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("cpu", Map("h" -> "a")), ("cpu", Map("h" -> "a")), ("cpu", Map("h" -> "b")))
      .toDF("metric", "tags")
      .select(SeriesId.seriesId(col("metric"), col("tags")).as("id"))
    val ids = df.collect().map(_.getLong(0))
    assert(ids(0) === ids(1))
    assert(ids(0) !== ids(2))
  }

  test("metricId and tagSetId decompose the series identity (reference hash pair)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      ("cpu", Map("h" -> "a")), ("mem", Map("h" -> "a")), ("cpu", Map("h" -> "b")))
      .toDF("metric", "tags")
      .select(
        SeriesId.metricId(col("metric")).as("m"),
        SeriesId.tagSetId(col("tags")).as("t"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0)._1 != rows(1)._1, "different metrics, different metric hash")
    assert(rows(0)._1 == rows(2)._1, "same metric, same metric hash")
    assert(rows(0)._2 == rows(1)._2, "same tag set, same tag-set hash (shard key)")
    assert(rows(0)._2 != rows(2)._2, "different tag sets, different tag-set hash")
  }
}
