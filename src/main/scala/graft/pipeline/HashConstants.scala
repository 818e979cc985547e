package graft.pipeline

/**
 * Deterministic constants shared by the Spark operators and the DuckDB
 * oracle SQL (both sides are generated from these same values, so the
 * correctness gate replays the exact same arithmetic).
 *
 * Base hash everywhere is a 28-bit integer from an md5 hex prefix —
 * md5 is the one string hash both engines implement identically; 28 bits
 * keeps every product below 2^59, safely inside signed-64 arithmetic in
 * both engines (DuckDB errors on bigint overflow rather than wrapping).
 */
object HashConstants {

  /** Mersenne prime 2^31 − 1: modulus for all permutation arithmetic. */
  val P: Long = 2147483647L

  /** MinHash signature length and LSH banding shape (8 bands × 4 rows):
   *  with these, a pair at Jaccard 0.5 is caught with prob ≈ 0.42, at
   *  0.8 with ≈ 0.97 — the standard banding trade-off. */
  val NumPerms = 32
  val NumBands = 8
  val RowsPerBand = 4

  /** glibc-style LCG used only to *generate* fixed coefficients. */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (1103515245L * x + 12345L) % 2147483648L).drop(1)

  /** MinHash permutation coefficients: h_i(x) = (a_i·x + b_i) mod P. */
  val PermA: IndexedSeq[Long] = lcg(42).take(NumPerms).map(x => (x % (P - 1)) + 1).toIndexedSeq
  val PermB: IndexedSeq[Long] = lcg(4242).take(NumPerms).map(_ % P).toIndexedSeq

  /** Winnowing fingerprint: window of 5 token hashes, base-31 weights. */
  val FpWindow = 5
  val FpWeights: IndexedSeq[Long] = (0 until FpWindow).map(j => math.pow(31, j).toLong)

  /** Random-hyperplane LSH for embeddings: NumPlanes sign bits over
   *  Dim-dimensional vectors. Components are k/8 with k ∈ [−1000, 1000]
   *  — exact in binary floating point, so both engines see identical
   *  plane values. */
  val NumPlanes = 6
  val Dim = 64
  val Planes: IndexedSeq[IndexedSeq[Double]] = {
    val it = lcg(777)
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(((it.next() % 2001) - 1000) / 8.0))
  }

  /** Multi-table banded hyperplane LSH for embedding NEAR-DUP detection
   *  (the all-pairs-adjacent path, unlike the query-side ANN above):
   *  NdTables independent tables of NdPlanesPerTable sign bits each. A
   *  pair is a candidate iff it collides in at least one table — the
   *  hyperplane analog of the MinHash banding in [[NumBands]]×
   *  [[RowsPerBand]]. Per-table collision at cosine s is
   *  p(s)^NdPlanesPerTable with p(s) = 1 − arccos(s)/π, so recall is
   *  1 − (1 − p^b)^T while the per-table bucket fan-out is 2^b (a single
   *  coarse table is all-pairs ÷ 2^b — the scale degeneracy this shape
   *  replaces). These defaults (4×8) are tuned for the synthetic
   *  moderate-similarity corpus the oracle replays; a production
   *  high-threshold dedup (cosine ≥ 0.9, p ≥ 0.86) wants 16-24 planes
   *  per table and more tables, plus the bucket-size cap. */
  val NdTables = 4
  val NdPlanesPerTable = 8

  /** Plane tables for ANY (tables, planesPerTable) — one fixed lcg
   *  stream, so (NdTables, NdPlanesPerTable) reproduces [[NdPlanes]]
   *  exactly and a larger planesPerTable REFINES table 0's buckets
   *  (its first planes coincide), while a larger table count EXTENDS
   *  the table set (strictly more recall). These are the scale knobs:
   *  a bigger corpus wants more planes per table (smaller buckets) and
   *  more tables (recall back up). */
  def ndPlaneTables(tables: Int, planesPerTable: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val it = lcg(31337)
    IndexedSeq.fill(tables)(IndexedSeq.fill(planesPerTable)(
      IndexedSeq.fill(Dim)(((it.next() % 2001) - 1000) / 8.0)))
  }

  val NdPlanes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    ndPlaneTables(NdTables, NdPlanesPerTable)

  /** Language-ID stopword markers, in tie-break priority order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "una", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "zh" -> Seq("de", "shi", "zai", "he", "le"))

  /** English-ish stopword list for quality scoring. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "on")
}
