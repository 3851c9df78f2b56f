package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Recall specs for the approximate ANN paths (SURVEY §2.4): LSH and IVF
  * are defined by recall@k against the exact brute-force baseline on the
  * same corpus, plus the candidate-pruning property that makes them the
  * scale path.
  */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet // (query_id, neighbor_id)

  private lazy val brute = pairs(Similarity.bruteTopK(emb))

  test("brute topk returns k neighbors per query, ranked by cosine desc") {
    val rows = Similarity.bruteTopK(emb).collect()
    assert(rows.length == Similarity.NumQueries * 5)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("LSH topk recall@5 vs brute") {
    val lsh = pairs(Similarity.lshTopK(emb))
    val recall = (lsh & brute).size.toDouble / brute.size
    // floor tight enough to catch a bucketing regression: 16 tables ×
    // 6 bits with 1-bit multiprobe measurably delivers ≥0.9 here
    assert(recall >= 0.85, s"LSH recall $recall below floor")
  }

  test("IVF topk recall@5 vs brute, with real pruning") {
    val ivf = pairs(Similarity.ivfTopK(emb))
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF recall $recall below floor")
  }

  test("incremental IVF: frozen-centroid append equals the one-shot build, recall holds") {
    // The maintained-index contract: a growing corpus appends arrival
    // batches via ivfAssign against FROZEN centroids — O(|batch|), no
    // re-assignment of the existing corpus — and the chained result is
    // the one-shot assignment VERBATIM (deterministic kernel), so
    // append-then-query equals build-then-query exactly.
    import org.apache.spark.sql.functions.col
    val corpus = emb.filter(col("vec_id") >= Similarity.NumQueries)
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val arrivals = corpus.filter(col("vec_id") % 5 === 0)
    // centroids trained on the BASE only — arrivals were not seen
    val centroids = Similarity.ivfTrain(base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val oneShot = rows(Similarity.ivfAssign(corpus, centroids))
    val appendedA = Similarity.ivfAssign(base, centroids)
    val appendedB = Similarity.ivfAssign(arrivals, centroids)
    assert(rows(appendedA.unionByName(appendedB)) == oneShot,
      "chunked frozen-centroid append diverged from the one-shot assignment")
    // the append touched ONLY the arrivals
    assert(appendedB.count() == arrivals.count())
    // query the maintained index. Base-trained centroids never saw the
    // arrivals, so the index runs more probing (8 of 16 cells vs the
    // one-shot's 4) to hold the same floor across SFs — the standard
    // maintained-index trade until the drift monitor triggers a
    // re-train (measured: nprobe=4 gives 0.66 at sf0.001; 6 clears
    // sf0.001 but not sf0.01; 8 clears every SF — matching the
    // ann_recall_check ivf_incr variant).
    val topk = Similarity.ivfTopKFromIndex(emb, appendedA.unionByName(appendedB),
      centroids, nprobe = 8)
    val recall = (pairs(topk) & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"incremental-IVF recall $recall below floor")
    // drift monitor: every corpus vector is in exactly one cell
    val stats = Similarity.ivfCellStats(appendedA.unionByName(appendedB))
      .collect().map(r => r.getLong(1)).toSeq
    assert(stats.sum == corpus.count(), "cell stats must cover the corpus exactly once")
  }

  test("PQ topk recall@5 vs brute, scores exact after re-rank") {
    val pq = Similarity.pqTopK(emb)
    val recall = (pairs(pq) & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"PQ recall $recall below floor")
    // emitted scores are TRUE cosines (re-ranked), not ADC approximations:
    // every (query, neighbor, score) triple must appear in the brute scan
    val bruteScores = Similarity.bruteScores(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pq.collect().forall(r =>
      bruteScores((r.getLong(0), r.getLong(2), r.getDouble(3)))))
  }

  test("PCA topk recall@5 vs brute, scores exact after re-rank") {
    val pca = Similarity.pcaTopK(emb)
    val recall = (pairs(pca) & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"PCA recall $recall below floor")
    // the projected-L2 candidate pass is approximate; the emitted
    // scores must be TRUE full-dimension cosines (re-ranked)
    val bruteScores = Similarity.bruteScores(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pca.collect().forall(r =>
      bruteScores((r.getLong(0), r.getLong(2), r.getDouble(3)))))
  }

  test("IVF+PQ topk recall@5 vs brute, scores exact after re-rank") {
    val ivfpq = Similarity.ivfpqTopK(emb)
    val recall = (pairs(ivfpq) & brute).size.toDouble / brute.size
    // both approximations stack (cell pruning AND residual codes), so
    // the floor sits at the IVF/PQ level — residual encoding typically
    // lands it well above
    assert(recall >= 0.7, s"IVF+PQ recall $recall below floor")
    val bruteScores = Similarity.bruteScores(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ivfpq.collect().forall(r =>
      bruteScores((r.getLong(0), r.getLong(2), r.getDouble(3)))))
  }

  test("TopKAgg keeps the k best with (score desc, id asc) tie-break under any arrival order") {
    import spark.implicits._
    val scores = Seq(
      (1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 12L), (1L, 0.1, 13L), (1L, 0.7, 14L),
      (2L, 0.3, 20L), (2L, 0.3, 21L))
      .toDF("query_id", "cos_sim", "neighbor_id")
      .repartition(5) // force partial buffers + merge
    val got = Similarity.topK(scores, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 11L, 0.9), (1L, 2L, 12L, 0.9), (1L, 3L, 14L, 0.7),
      (2L, 1L, 20L, 0.3), (2L, 2L, 21L, 0.3)))
  }

  test("PQ and IVF survive a corpus smaller than their cell counts") {
    // kmeansLite trains min(nCells, |sample|) cells; lookups must size
    // off the returned length, not the request
    val tiny = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 22) // 10 queries + 12 corpus
    assert(Similarity.pqTopK(tiny).count() > 0)
    assert(Similarity.ivfTopK(tiny).count() > 0)
    assert(Similarity.ivfpqTopK(tiny).count() > 0)
  }

  test("hyperplanes and centroids are deterministic") {
    val a = Similarity.hyperplanes(2, 3, 4)
    val b = Similarity.hyperplanes(2, 3, 4)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    val sample = Array((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)), (3L, Array(1.0, 1.0)))
    val c1 = Similarity.kmeansLite(sample, 2)
    val c2 = Similarity.kmeansLite(sample, 2)
    assert(c1.flatten.toSeq == c2.flatten.toSeq)
  }

  test("maxCellShare: the drift metric trips on the engineered wave and stays quiet on the stable corpus") {
    // the re-train trigger's margins, measured on the driver table:
    // natural max-cell share ≤ 0.084 at every SF, the shifted wave's
    // ≥ 0.24 — the 0.15 threshold sits ~1.8× from both (the same
    // construction the migrating loop's monitor sees)
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val corpus = emb.filter(col("vec_id") >= Similarity.NumQueries)
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val v1 = Similarity.ivfTrain(base.orderBy(col("vec_id")))
    val threshold = graft.streaming.Events.DriftMaxCellShareDefault
    val stable = Similarity.maxCellShare(
      Similarity.ivfCellStats(Similarity.ivfAssign(corpus, v1)))
    assert(stable <= threshold,
      f"stable corpus reads $stable%.3f — over the $threshold trigger")
    val wave = graft.streaming.Events.driftShift(corpus.filter(col("vec_id") % 5 === 0))
    val drifted = Similarity.maxCellShare(
      Similarity.ivfCellStats(Similarity.ivfAssign(base.unionByName(wave), v1)))
    assert(drifted > threshold,
      f"drifted corpus reads $drifted%.3f — under the $threshold trigger")
    // empty stats read 0.0: nothing indexed, nothing to migrate
    assert(Similarity.maxCellShare(
      Similarity.ivfCellStats(Similarity.ivfAssign(corpus.limit(0), v1))) == 0.0)
  }
}
