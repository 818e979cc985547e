package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count–min sketch (Cormode & Muthukrishnan 2005, "An improved data
 * stream summary: the count-min sketch and its applications"): a d×w
 * grid of counters; every occurrence of a key increments one cell per
 * row (cell j = hash_i(key) mod w), and a key's estimated frequency is
 * the MINIMUM of its d cells — never an underestimate, over by at most
 * εN (ε = e/w) with probability 1−δ (δ = e^−d).
 *
 * Where this fits the engine: the reference's meta/top-frequency
 * answers walk an exact inverted index (core meta
 * NewDocStore.java:883-1090); the exact batch equivalent is a
 * fact-sized groupBy — a full shuffle keyed by a possibly-huge key
 * domain. The sketch is the bounded summary: whatever the key
 * cardinality or fact size, the state is d·w counters — small enough
 * to broadcast, cheap enough to keep per micro-batch. Because cells
 * are sums, sketches MERGE by cell-wise addition: the streaming ingest
 * appends one partial sketch per micro-batch and the read-side
 * cell-sum equals the one-shot batch sketch EXACTLY (the same
 * counts-add contract as the drift token counts), so the streamed
 * estimate is bit-identical to the batch estimate, not merely close.
 *
 * Determinism: hash_i(key) = md5prefix28(i + "|" + key) — the engine's
 * 28-bit base hash (one codegen'd digest per row), restated verbatim
 * by the DuckDB oracles as ('0x' || substr(md5(...), 1, 7))::BIGINT.
 *
 * Plan shape at 100 TB: the build explodes each fact row into d cell
 * increments, but partial aggregation collapses them to ≤ d·w rows per
 * map partition BEFORE the exchange — the shuffle is bounded by
 * partitions × d·w whatever the fact size. Estimation broadcasts the
 * ≤ d·w-cell sketch; no fact-sized side ever shuffles on the key.
 */
object CountMin {

  /** Cell column for hash row `i` of `key` (both Columns). */
  private def cell(i: Column, key: Column, w: Int): Column =
    pmod(call_function("md5prefix28",
      concat(i.cast("string"), lit("|"), key.cast("string"))), lit(w))

  /** Build the sketch: one (i, j, cnt) row per non-empty cell, ≤ d·w
   *  rows total. Null keys are skipped (no NULL frequency class). */
  def sketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col("i"), cell(col("i"), col("__k"), width).as("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge appended partial sketches (per-micro-batch cell rows) into
   *  the current sketch: cell-wise sum — the CM merge operation. */
  def merge(cells: DataFrame): DataFrame =
    cells.groupBy(col("i"), col("j")).agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of every key in `keys` (a small
   *  candidate relation with a `key` string column): min over the d
   *  cells, 0 for cells the sketch never touched. The sketch side is
   *  broadcast — candidates never shuffle. */
  def estimate(cells: DataFrame, keys: DataFrame, depth: Int, width: Int): DataFrame =
    keys.select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .withColumn("j", cell(col("i"), col("key"), width))
      .join(broadcast(cells), Seq("i", "j"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))

  /** Estimator-quality report (the minhashEval discipline): the top-k
   *  keys by EXACT count, each with its exact and sketch-estimated
   *  frequency. `est_n >= exact_n` always (CM never underestimates);
   *  the gap is the collision overcount the chosen width buys. The
   *  exact side is the evaluation harness, not the production read —
   *  a deployment keeps only the cells. Ordering (exact desc, key asc)
   *  + the rank cut make the report replayable. */
  def report(df: DataFrame, key: Column, depth: Int, width: Int, k: Int): DataFrame = {
    val exact = df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
    val top = exact.orderBy(col("exact_n").desc, col("key").asc).limit(k)
    reportAgainst(sketch(df, key, depth, width), top, depth, width)
  }

  /** As [[report]], but against PRE-BUILT cells (the streamed read:
   *  merged micro-batch partials). `top` carries (key, exact_n). */
  def reportAgainst(cells: DataFrame, top: DataFrame,
      depth: Int, width: Int): DataFrame =
    estimate(cells, top, depth, width)
      .join(top, "key")
      .select(col("key"), col("exact_n"), col("est_n"))
      .orderBy(col("exact_n").desc, col("key").asc)

  /** Dimension planner (the bandingPlan discipline — pick d×w from the
   *  target guarantee analytically, not folklore): for overcount
   *  tolerance ε·N and failure probability δ, the canonical sizing is
   *  w = ⌈e/ε⌉ and d = ⌈ln(1/δ)⌉ (Cormode & Muthukrishnan 2005, Thm 1).
   *  One row per stream-size decade with the absolute overcount bound
   *  and the cell budget — closed-form, no data scan. */
  def plan(spark: org.apache.spark.sql.SparkSession,
      eps: Double = 0.001, delta: Double = 0.01): DataFrame = {
    require(eps > 0 && eps < 1, s"eps in (0,1): $eps")
    require(delta > 0 && delta < 1, s"delta in (0,1): $delta")
    val w = math.ceil(math.E / eps).toLong
    val d = math.ceil(math.log(1.0 / delta)).toLong
    spark.range(6, 12) // 10^6 .. 10^11 items
      .select(
        pow(lit(10.0), col("id")).cast("long").as("n_items"),
        lit(d).as("depth"), lit(w).as("width"), lit(d * w).as("cells"),
        round(lit(eps) * pow(lit(10.0), col("id")), 4).as("max_overcount"),
        round(lit(1.0 - delta), 4).as("confidence"))
  }
}
