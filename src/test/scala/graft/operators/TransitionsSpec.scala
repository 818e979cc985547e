package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transition-matrix invariants: per-entity chaining, conditional rows
 *  summing to 1, and the tiebreak total order on same-second events. */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)]) =
    Transitions.matrix(rows.toDF("u", "t", "ts", "seq"),
      col("u"), col("t"), col("ts"), col("seq"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("pairs chain within each entity; conditionals normalize per prev row") {
    // user 1: A B A C ; user 2: A B  → A→B ×2, B→A ×1, A→C ×1
    val m = run(Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L), (1L, "C", 40L, 4L),
      (2L, "A", 10L, 5L), (2L, "B", 20L, 6L)))
    assert(m(("A", "B")) === ((2L, 0.6667)))
    assert(m(("A", "C")) === ((1L, 0.3333)))
    assert(m(("B", "A")) === ((1L, 1.0)))
    assert(m.size === 3, "no cross-user pair may appear")
  }

  test("same-second events order by the tiebreak, not arrival") {
    // both at ts=10: seq decides B precedes C
    val m = run(Seq(
      (1L, "A", 5L, 1L), (1L, "B", 10L, 2L), (1L, "C", 10L, 3L)))
    assert(m.keySet === Set(("A", "B"), ("B", "C")))
  }

  test("a single-event entity contributes no pairs") {
    val m = run(Seq((1L, "A", 5L, 1L)))
    assert(m.isEmpty)
  }

  private def runCapped(rows: Seq[(Long, String, Long, Long)], h: Int) =
    Transitions.matrix(rows.toDF("u", "t", "ts", "seq"),
      col("u"), col("t"), col("ts"), col("seq"), maxTypes = Some(h))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("maxTypes buckets tail types to __other BEFORE chaining") {
    // counts: A×3, B×2, C×1, D×1 → head(2) = {A, B}; C and D collapse.
    // user 1: A C A D B A → with remap: A __other A __other B A
    val rows = Seq(
      (1L, "A", 10L, 1L), (1L, "C", 20L, 2L), (1L, "A", 30L, 3L),
      (1L, "D", 40L, 4L), (1L, "B", 50L, 5L), (1L, "A", 60L, 6L))
    val m = runCapped(rows, 2)
    assert(m === Map(
      ("A", Transitions.OtherType) -> 2L,
      (Transitions.OtherType, "A") -> 1L,
      (Transitions.OtherType, "B") -> 1L,
      ("B", "A") -> 1L))
    // the matrix label domain is bounded by head + __other
    val labels = m.keySet.flatMap(k => Set(k._1, k._2))
    assert(labels.subsetOf(Set("A", "B", Transitions.OtherType)))
  }

  test("head ties break on the type string (count desc, type asc)") {
    // B and C tie at 1; head(2) with A×2 keeps {A, B} (B < C)
    val rows = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L), (1L, "C", 40L, 4L))
    val m = runCapped(rows, 2)
    assert(m.keySet === Set(("A", "B"), ("B", "A"), ("A", Transitions.OtherType)))
  }

  test("a non-binding cap is the identity") {
    val rows = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L))
    assert(runCapped(rows, 5) === run(rows).view.mapValues(_._1).toMap)
  }

  test("null types never occupy a head slot") {
    // null×3 outranks both real types but could never match the head
    // equi-join — the slots must go to real types, and null rows bucket
    // to __other like any tail type
    val rows = Seq(
      (1L, "A", 10L, 1L), (1L, null.asInstanceOf[String], 20L, 2L),
      (1L, null.asInstanceOf[String], 30L, 3L), (1L, "A", 40L, 4L),
      (1L, null.asInstanceOf[String], 50L, 5L), (1L, "B", 60L, 6L),
      (1L, "B", 70L, 7L))
    val m = runCapped(rows, 2)
    val labels = m.keySet.flatMap(k => Set(k._1, k._2))
    assert(labels.subsetOf(Set("A", "B", Transitions.OtherType)))
    // chain with remap: A __o __o A __o B B
    assert(m === Map(
      ("A", Transitions.OtherType) -> 2L,
      (Transitions.OtherType, Transitions.OtherType) -> 1L,
      (Transitions.OtherType, "A") -> 1L,
      (Transitions.OtherType, "B") -> 1L,
      ("B", "B") -> 1L))
  }

  test("maxTypes < 1 is rejected") {
    intercept[IllegalArgumentException](runCapped(Seq((1L, "A", 5L, 1L)), 0))
  }
}
