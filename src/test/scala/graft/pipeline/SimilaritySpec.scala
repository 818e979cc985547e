package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: recall of the bucketed/IVF paths against the brute-force
 *  baseline, and the ordering the scale knobs must respect (multi-probe
 *  ≥ single-bucket; k-means centroids ≥ sampled centroids). */
class SimilaritySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private val K = 3
  private def spark = TestSpark.spark
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def pred = col("vec_id") % 25 === 0

  /** |ann ∩ brute| / |brute| over (q_id, vec_id) pairs. */
  private def recallVsBrute(ann: DataFrame, brute: DataFrame): Double = {
    val hits = ann.select("q_id", "vec_id")
      .join(brute.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    hits.toDouble / brute.count()
  }

  test("hardNegatives: every result crosses labels; nearest same-label vec never appears; " +
      "ranks follow the brute order restricted to other labels") {
    val s = spark
    import s.implicits._
    // 2D embeddings: query 0 (label 0) sits next to 1 (label 0, nearest
    // overall) and 2/3 (label 1); 4 is label-0 far away
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.999f, 0.01f), 0),  // nearest, same label → excluded
      (2L, Array(0.9f, 0.3f), 1),
      (3L, Array(0.5f, 0.8f), 1),
      (4L, Array(-1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(tiny, col("vec_id") === 0, 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L))
    assert(out.forall(_.getAs[Int]("label") === 1))
    // against the real table: hard negatives = brute top-k AFTER
    // dropping same-label rows (computed via a label-filtered brute run)
    val hn = Similarity.hardNegatives(emb, pred, K)
    val labels = emb.select(col("vec_id"), col("label"))
    val crossed = hn.join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "q_label"), "q_id")
      .filter(col("label") === col("q_label")).count()
    assert(crossed === 0, "no hard negative may share the query's label")
    assert(hn.groupBy("q_id").count().select(max("count")).head.getLong(0) <= K)
  }

  test("hashSampledCentroids: exactly k rows, deterministic, corpus-size-independent prefix") {
    val c64 = Similarity.hashSampledCentroids(emb, 64).collect()
    assert(c64.length === 64)
    // deterministic: same 64 ids on a rerun
    val again = Similarity.hashSampledCentroids(emb, 64).collect()
    assert(c64.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
    // nested: k=16 is a prefix of k=64 in the same hash order (so growing
    // k only ADDs centroids — stable assignments across re-tunings)
    val c16 = Similarity.hashSampledCentroids(emb, 16).collect().map(_.getLong(0)).toSet
    assert(c16.subsetOf(c64.map(_.getLong(0)).toSet))
    // constant-k PQ codebooks: k codewords per subspace, every subspace
    val cb = Similarity.pqCodebooksK(emb, m = 8, k = 32)
      .groupBy(col("sub")).agg(count(lit(1)).as("n")).collect()
    assert(cb.length === 8 && cb.forall(_.getLong(1) === 32L))
  }

  test("multi-probe LSH recall is at least single-bucket recall (and candidates superset)") {
    val brute = Similarity.bruteForceTopK(emb, pred, K).cache()
    val single = recallVsBrute(Similarity.lshTopK(emb, pred, K), brute)
    val multi = recallVsBrute(Similarity.lshTopK(emb, pred, K, probeRadius = 1), brute)
    info(f"recall@$K single-bucket=$single%.3f multi-probe=$multi%.3f")
    assert(multi >= single)
    assert(multi > 0.0)
    brute.unpersist(): Unit
  }

  test("Lloyd iterations monotonically reduce quantization cost; recall stays at parity") {
    // The k-means guarantee is on the quantization objective, not on
    // single-cell recall: on this (near-uniform) synthetic corpus Lloyd
    // mostly equalizes cell sizes, so recall lands at parity with the
    // sampled init (measured 0.58-0.60 both ways at sf0.01) while the
    // mean distance-to-centroid strictly drops.
    val init = Similarity.sampledCentroids(emb, centroidEvery = 100)
    val c1 = Similarity.kmeansCentroids(emb, centroidEvery = 100, iters = 1)
    val c2 = Similarity.kmeansCentroids(emb, centroidEvery = 100, iters = 2)
    val cost0 = Similarity.quantizationCost(emb, init)
    val cost1 = Similarity.quantizationCost(emb, c1)
    val cost2 = Similarity.quantizationCost(emb, c2)
    info(f"quantization cost init=$cost0%.4f iter1=$cost1%.4f iter2=$cost2%.4f")
    assert(cost1 < cost0)
    assert(cost2 <= cost1)

    val brute = Similarity.bruteForceTopK(emb, pred, K).cache()
    val sampled = recallVsBrute(Similarity.ivfTopK(emb, pred, K, centroidEvery = 100), brute)
    val kmeans = recallVsBrute(Similarity.ivfTopKWith(emb, c2, pred, K), brute)
    info(f"recall@$K sampled=$sampled%.3f kmeans=$kmeans%.3f")
    assert(kmeans >= sampled - 0.05, "kmeans recall must stay at parity with the sampled init")
    assert(kmeans > 0.0)
    brute.unpersist(): Unit
  }

  test("kmeans centroids keep the dimension and cover every init cell's data") {
    val cents = Similarity.kmeansCentroids(emb, centroidEvery = 100, iters = 1)
      .collect()
    assert(cents.nonEmpty)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    assert(cents.forall(_.getAs[scala.collection.Seq[Double]]("c_vec").length == dim))
  }

  test("centroid assignment collapses the n·k expansion in a HashAggregate (no Window/Sort)") {
    val plan = Similarity.ivfAssign(emb, centroidEvery = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"argmin must not plan a Window:\n$plan")
    assert(!plan.contains("SortAggregate"), s"argmin buffer must stay primitive:\n$plan")
  }

  test("multi-probe IVF: recall at least single-cell, candidates a superset") {
    val brute = Similarity.bruteForceTopK(emb, pred, K).cache()
    val one = recallVsBrute(Similarity.ivfTopK(emb, pred, K, centroidEvery = 100), brute)
    val two = recallVsBrute(Similarity.ivfTopKWith(
      emb, Similarity.sampledCentroids(emb, 100), pred, K, nprobe = 2), brute)
    info(f"recall@$K nprobe1=$one%.3f nprobe2=$two%.3f")
    assert(two >= one)
    brute.unpersist(): Unit
  }

  test("recallAtK agrees with the spec-local recall; n_hit bounded by n_exact") {
    val cents = Similarity.hashSampledCentroids(emb, 8)
    val out = Similarity.recallAtK(emb, cents, pred, K, nprobe = 2).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nExact, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nHit <= nExact && nExact <= K)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // the aggregate of the per-query rows equals the spec-local pair recall
    val aggregate = out.map(_.getLong(2)).sum.toDouble / out.map(_.getLong(1)).sum
    val expected = recallVsBrute(
      Similarity.ivfTopKWith(emb, cents, pred, K, nprobe = 2),
      Similarity.bruteForceTopK(emb, pred, K))
    assert(math.abs(aggregate - expected) < 1e-12)
  }

  test("centroidsBy: one row per (group, dim); member counts constant across dims") {
    val cents = Similarity.centroidsBy(emb, col("label")).collect()
    val groups = cents.groupBy(_.getAs[Any]("grp").toString)
    assert(groups.nonEmpty)
    groups.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq === (0L until 64L))
      assert(rows.map(_.getAs[Long]("n_vecs")).distinct.length === 1)
    }
  }

  test("quantize: components land in [0, 255] and use the grid; full corpus attains both ends") {
    val sub = Similarity.quantize(emb, col("vec_id") % 50 === 0)
      .collect().map(_.getAs[Long]("q"))
    assert(sub.nonEmpty)
    assert(sub.forall(v => v >= 0L && v <= 255L))
    assert(sub.distinct.length > 16) // a real spread, not a constant map
    // quantizing the WHOLE corpus must hit both grid ends: each dim's
    // min maps to 0 and max to 255 by construction
    val all = Similarity.quantize(emb, lit(true)).agg(min(col("q")), max(col("q"))).head
    assert(all.getLong(0) === 0L && all.getLong(1) === 255L)
  }

  test("multi-table near-dup recall beats a single table; pairs are a subset of ground truth") {
    import HashConstants._
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // ground truth: ALL pairs at cosine >= 0.3 (test-only all-pairs join)
    val truth = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("a.v"), col("b.v")), 4))
      .filter(col("sim") >= 0.3)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b")).cache()
    val nTruth = truth.count().toDouble
    assert(nTruth > 0)
    val multi = Similarity.cosineNearDuplicates(emb, 0.3)
    // every reported pair must be genuine (LSH only recalls, never invents)
    assert(multi.join(truth, Seq("vec_a", "vec_b"), "left_anti").count() === 0L)
    // single-table recall = pairs colliding in table 0 only
    val t0 = vecs.select(col("vec_id"), Similarity.ndBucketId(col("v"), 0).as("bucket"))
    val singleHits = t0.as("a").join(t0.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .join(truth, Seq("vec_a", "vec_b"), "left_semi").count().toDouble
    val multiHits = multi.count().toDouble
    val (rMulti, rSingle) = (multiHits / nTruth, singleHits / nTruth)
    info(f"near-dup recall@0.3: ${NdTables}-table=$rMulti%.3f single-table=$rSingle%.3f (n_truth=${nTruth.toLong})")
    assert(rMulti >= rSingle, "union of tables must recall at least any one table")
    assert(rMulti > 0.0)
    truth.unpersist(): Unit
  }

  test("banding knobs: more tables recall a superset; more planes shrink candidate volume") {
    val base = Similarity.cosineNearDuplicates(emb, 0.3).cache()
    // 8 tables extend the default 4 (same plane stream): strictly more
    // collision chances, so the pair set is a superset
    val moreTables = Similarity.cosineNearDuplicates(emb, 0.3, Int.MaxValue,
      tables = 8, planesPerTable = 8)
    assert(base.join(moreTables, Seq("vec_a", "vec_b"), "left_anti").count() === 0L)
    assert(moreTables.count() >= base.count())
    // 16 planes per table quarter the bucket occupancy: candidate volume
    // (and thus the found pairs on this sim-moderate corpus) shrinks
    val finer = Similarity.cosineNearDuplicates(emb, 0.3, Int.MaxValue,
      tables = 4, planesPerTable = 16)
    assert(finer.count() <= base.count())
    base.unpersist(): Unit
  }

  test("ivfPqResidualTopK: results stay in the query's cell; recall comparable to raw-code IVF-PQ") {
    val cents = Similarity.hashSampledCentroids(emb, 64)
    val resDf = Similarity.ivfPqResidualTopK(emb, cents, pred, K, m = 8, codebookK = 32)
    val res = resDf.collect()
    // structural guarantees: dense ranks, no self-match, and every hit
    // shares its query's coarse cell (the scan touched ONE cell)
    val cellOf = Similarity.ivfAssignWith(emb, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length).toSeq)
      rows.foreach { r =>
        val v = r.getAs[Long]("vec_id")
        assert(v !== q)
        assert(cellOf(v) === cellOf(q), s"hit $v outside query $q's cell")
      }
    }
    // the residual claim is about code accuracy at equal storage: both
    // layouts scan the same single cell, so recall differences come
    // only from what the codes preserve
    val brute = Similarity.bruteForceTopK(emb, pred, K).cache()
    val raw = Similarity.ivfPqTopKWith(emb, cents,
      Similarity.pqCodebooksK(emb, m = 8, k = 32), pred, K, m = 8)
    val rRes = recallVsBrute(resDf, brute)
    val rRaw = recallVsBrute(raw, brute)
    info(f"recall@$K residual=$rRes%.3f raw-codes=$rRaw%.3f")
    assert(rRes > 0.0)
    // parity claim with teeth: a broken residual codebook (e.g. raw
    // codewords against residual vectors) collapses recall to ~one
    // accidental hit; measured 0.067 vs 0.133 on this corpus
    assert(rRes >= rRaw - 0.1,
      f"residual recall $rRes%.3f fell more than 0.1 below raw-code recall $rRaw%.3f")
    brute.unpersist(): Unit
  }

  test("clusterCapSample: per-cell cap enforced; survivors are exactly the hash-min members") {
    // k=8 cells over the 500-vector sf0.01 corpus averages ~62 members
    // per cell, so cap=10 must bind (k=64 would leave ~8/cell — unbound)
    val out = Similarity.clusterCapSample(emb, 8, 10).collect()
    val byCell = out.groupBy(_.getAs[Long]("cell"))
    assert(byCell.values.forall(_.length <= 10))
    assert(byCell.values.exists(_.length == 10), "cap must bind on this corpus")
    // ranks are dense 1..n per cell
    byCell.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // membership is reproducible: the kept ids per cell are the first
    // `cap` in (md5-prefix, vec_id) order of that cell's FULL population
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val full = Similarity.clusterCapSample(emb, 8, Int.MaxValue).collect()
      .groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (cell, rows) =>
      val expect = full(cell).map(_.getAs[Long]("vec_id"))
        .sortBy(id => (h(id), id)).take(10).toSet
      assert(rows.map(_.getAs[Long]("vec_id")).toSet === expect)
    }
  }

  test("exact-embedding dedup collapses planted clones; 1e-4 grid tolerates float jitter") {
    val spark2 = spark
    import spark2.implicits._
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val jitter = base.clone(); jitter(0) = (base(0) + 1e-6).toFloat // inside the grid cell
    val other = Array.tabulate(64)(i => math.cos(i + 1).toFloat)
    val df = Seq((1L, base), (2L, base), (7L, jitter), (9L, other))
      .toDF("vec_id", "embedding")
    val groups = Similarity.exactDuplicates(df).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups === Map(1L -> 3L, 9L -> 1L),
      "clones and sub-grid jitter collapse to the min id; distinct vectors stay apart")
  }

  test("bucket-size cap drops a planted clone cluster instead of joining it quadratically") {
    val spark2 = spark
    import spark2.implicits._
    // 30-vector corpus: ids 0-9 are IDENTICAL (a clone cluster — collides
    // in every table), ids 10-29 spread deterministic distinct directions
    val clone = Array.tabulate(64)(i => math.sin(i + 1))
    val rows = (0L until 30L).map { id =>
      val v = if (id < 10) clone
              else Array.tabulate(64)(i => math.cos((id * 67 + i * 13 + 1).toDouble))
      (id, v.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDuplicates(df, 0.99)
    val clonePairsUncapped = uncapped
      .filter(col("vec_a") < 10 && col("vec_b") < 10).count()
    assert(clonePairsUncapped === 45L, "uncapped: all 10·9/2 clone pairs surface")
    val capped = Similarity.cosineNearDuplicates(df, 0.99, maxBucketSize = 5)
    assert(capped.filter(col("vec_a") < 10 && col("vec_b") < 10).count() === 0L,
      "capped: the over-full clone buckets are dropped whole")
    // and capping never invents pairs
    assert(capped.join(uncapped, Seq("vec_a", "vec_b"), "left_anti").count() === 0L)
  }

  test("PQ: codes are complete and bounded; ADC recall against exact-L2 brute force") {
    val m = 8
    val codes = Similarity.pqEncode(emb, m, every = 100).collect()
    val nVecs = emb.count()
    assert(codes.length === nVecs * m, "every vector gets exactly m codes")
    assert(codes.forall(_.getAs[Long]("code") % 100 === 0), "codes are sampled codeword ids")
    // exact squared-L2 brute-force top-k as the PQ ground truth (ADC
    // approximates L2, not cosine)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val d2 = Similarity.dot(col("a.v"), col("a.v")) -
      lit(2) * Similarity.dot(col("a.v"), col("b.v")) +
      Similarity.dot(col("b.v"), col("b.v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
    val brute = vecs.as("a").filter(pred)
      .join(vecs.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("vec_id"),
        round(d2, 4).as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
    val pq = Similarity.pqTopK(emb, pred, K, m, every = 100)
    val hits = pq.select("q_id", "vec_id")
      .join(brute.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    val recall = hits.toDouble / brute.count()
    info(f"PQ ADC recall@$K vs exact L2: $recall%.3f")
    assert(recall > 0.1, "compressed-domain search must beat noise")
  }

  test("rerankTopK: exact top-k within the PQ candidate superset; recall never below the PQ stage") {
    val m = 8
    val cb = Similarity.pqCodebooksK(emb, m, k = 32)
    val kCand = 4 * K
    val cand = Similarity.pqTopKWith(emb, cb, pred, kCand, m)
    val rr = Similarity.rerankTopK(emb, cb, pred, K, kCand, m)
    // every reranked hit came from the candidate superset
    val outside = rr.select("q_id", "vec_id")
      .join(cand.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_anti").count()
    assert(outside === 0, "rerank may only reorder candidates, not invent them")
    // within each query's candidate pool, rerank picks the EXACT cosine
    // top-k (4-decimal rounding, vec_id tiebreak)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    val sim = Similarity.dot(col("qv.v"), col("cv.v")) /
      (sqrt(Similarity.dot(col("qv.v"), col("qv.v"))) *
        sqrt(Similarity.dot(col("cv.v"), col("cv.v"))))
    val expected = cand.select(col("q_id"), col("vec_id"))
      .join(vecs.as("cv"), "vec_id")
      .join(vecs.as("qv").withColumnRenamed("vec_id", "q_id"), "q_id")
      .select(col("q_id"), col("vec_id"), round(sim, 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "vec_id")
    assert(rr.select("q_id", "rank", "vec_id").except(expected).count() === 0)
    assert(expected.except(rr.select("q_id", "rank", "vec_id")).count() === 0)
    // recall monotonicity vs the raw PQ stage at the same k (cosine truth)
    val brute = Similarity.bruteForceTopK(emb, pred, K)
    val rPq = recallVsBrute(Similarity.pqTopKWith(emb, cb, pred, K, m), brute)
    val rRr = recallVsBrute(rr, brute)
    info(f"recall@$K: pq=$rPq%.3f rerank=$rRr%.3f")
    assert(rRr >= rPq, "exact re-ranking of a superset cannot lose recall")
  }

  test("capped edges + exact-dup stars: a planted clone cluster still collapses, without the quadratic join") {
    val spark2 = spark
    import spark2.implicits._
    // 40 vectors: ids 0-19 IDENTICAL (a clone cluster twice the cap),
    // 20-39 distinct directions; threshold high so only clones qualify
    val clone = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val rows = (0L until 40L).map { id =>
      val v = if (id < 20) clone
              else Array.tabulate(64)(i => math.cos((id * 67 + i * 13 + 1).toDouble).toFloat)
      (id, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val edges = Similarity.nearDuplicateEdgesCapped(df, 0.99, maxBucketSize = 5)
    // the LSH side contributed NO clone pairs (buckets over the cap are
    // dropped whole), yet the star edges reconnect every clone…
    val labels = Dedup.duplicateClusters(
        edges.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach(id => assert(labels(id) === 0L,
      s"clone $id must land in the canonical component"))
    // …with only |clones|-1 star edges among the clones, never their
    // |clones|² pairs (other high-sim pairs among the distinct vectors
    // may legitimately surface via the uncapped buckets)
    assert(edges.filter(col("vec_a") < 20 && col("vec_b") < 20).count() === 19L)
  }

  test("semantic dedup clusters: every near-dup edge's endpoints share the component-min label") {
    val pairs = Similarity.cosineNearDuplicates(emb, 0.3)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).cache()
    val labels = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) => assert(labels(a) === labels(b)) }
    // the label is the component minimum, so it labels itself
    labels.values.foreach(c => assert(labels(c) === c))
    pairs.unpersist(): Unit
  }

  test("semanticDecontaminate: strongest leak per train vector, exact self-copies flagged at cos 1") {
    val evalPred = col("vec_id") % 50 === 0
    val flagged = Similarity.semanticDecontaminate(
      emb.filter(!evalPred), Similarity.evalVectors(emb, evalPred), 0.3)
    val rows = flagged.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // one row per flagged train vector (the argmax collapsed)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (vid, eid, c) =>
      assert(vid % 50 != 0 && eid % 50 == 0 && c >= 0.3 && c <= 1.0)
    }
    // a planted verbatim copy of an eval vector is the contamination the
    // operator exists to catch: flagged with cosine exactly 1.0
    val planted = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999983L))
    val withLeak = Similarity.semanticDecontaminate(
      emb.filter(!evalPred).unionByName(planted),
      Similarity.evalVectors(emb, evalPred), 0.3)
      .filter(col("vec_id") === 999983L).collect()
    assert(withLeak.length === 1)
    assert(withLeak.head.getLong(1) === 0L && withLeak.head.getDouble(2) === 1.0)
    // an eval id outside the 40-bit packing range fails loudly — a
    // silently dropped eval vector would silently weaken the scrub
    val badEval = Similarity.evalVectors(emb, evalPred)
      .withColumn("eval_id", col("eval_id") + lit(1L << 41))
    val e = intercept[Exception] {
      Similarity.semanticDecontaminate(emb.filter(!evalPred), badEval, 0.3).collect()
    }
    assert(e.getMessage.contains("40-bit"))
  }

  test("centroidDrift: orthogonal groups read 0, identical groups read 1") {
    val s = spark
    import s.implicits._
    // A: mass on dim 0; B: mass on dim 1 (orthogonal to A); C: same as A
    val df = Seq(
      (1L, Array(2f, 0f), "A"), (2L, Array(4f, 0f), "A"),
      (3L, Array(0f, 3f), "B"), (4L, Array(0f, 5f), "B"),
      (5L, Array(2f, 0f), "C"), (6L, Array(4f, 0f), "C"))
      .toDF("vec_id", "embedding", "grp")
    val got = Similarity.centroidDrift(df, col("grp"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("A", "B")) === 0.0)
    assert(got(("B", "C")) === 0.0)
    assert(got(("A", "C")) === 1.0)
    assert(got.size === 3, "each unordered pair reported once")
  }
}
