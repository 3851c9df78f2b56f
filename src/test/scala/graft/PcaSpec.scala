package graft

import graft.operators.Pca
import org.scalatest.funsuite.AnyFunSuite

/** Specs for distributed PCA (SURVEY §2.4): the driver eigensolver
  * against hand-computable matrices, variance capture on planted
  * low-rank data, and falsifiability of every `embed_pca_check` verdict
  * (a perturbed basis must flip `capture_ok`; a broken model must flip
  * the driver-side checks).
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("eigenSym on a hand-computable 2x2: eigenvalues 3,1 and the (1,1)/(1,-1) basis") {
    val (eig, vecs) = Pca.eigenSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig(0) - 3.0) < 1e-12 && math.abs(eig(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r2, r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vecs(1).zip(Array(r2, -r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("eigenSym on a diagonal matrix returns the diagonal sorted descending") {
    val (eig, vecs) = Pca.eigenSym(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(eig.toSeq == Seq(5.0, 3.0, 1.0))
    // eigenvectors are the matching unit axes (sign convention: positive)
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(vecs(1).toSeq == Seq(0.0, 0.0, 1.0))
    assert(vecs(2).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("eigenSym property: random symmetric matrices decompose exactly (residual, orthonormal, trace)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val d = 2 + rnd.nextInt(15) // 2..16
      val m = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val x = rnd.nextGaussian() * (1 + rnd.nextInt(5))
        m(i)(j) = x; m(j)(i) = x
      }
      val (eig, vecs) = Pca.eigenSym(m)
      val scale = math.max(1.0, eig.map(math.abs).max)
      // A v = lambda v for every pair
      for (c <- 0 until d) {
        val v = vecs(c)
        val av = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
        val res = av.zip(v).map { case (a, b) => math.abs(a - eig(c) * b) }.max
        assert(res < 1e-8 * scale, s"trial $trial d=$d comp $c residual $res")
      }
      // orthonormal basis, full trace, descending order
      for (a <- 0 until d; b <- a until d) {
        val dot = (0 until d).map(t => vecs(a)(t) * vecs(b)(t)).sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
      }
      assert(math.abs(eig.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-8 * scale)
      assert(eig.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  /** 300 vectors in R^8 that live (up to tiny noise) in the span of two
    * orthogonal directions with very different variances.
    */
  private def planted() = {
    import spark.implicits._
    val d1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val d2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val rnd = new scala.util.Random(7)
    (0 until 300).map { i =>
      val a = 10.0 * rnd.nextGaussian(); val b = 3.0 * rnd.nextGaussian()
      val noise = Array.fill(8)(0.01 * rnd.nextGaussian())
      (i.toLong, Array.tabulate(8)(t => (a * d1(t) + b * d2(t) + noise(t)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("planted rank-2 data: k=2 captures ~all variance and the check verdict is all-true") {
    val embs = planted()
    val model = Pca.fit(embs, k = 2)
    assert(model.topSum > 0.999 * model.trace,
      s"top-2 ${model.topSum} should carry ~all of trace ${model.trace}")
    val row = Pca.pcaCheck(embs, model).collect().head
    assert(row.getLong(0) == 300 && row.getLong(1) == 8L && row.getLong(2) == 2L)
    assert(Seq(3, 4, 5, 6).forall(row.getBoolean), s"verdict not all-true: $row")
    // the recovered top component is the planted dominant direction
    val got = model.components(0)
    val want = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val dot = got.zip(want).map { case (a, b) => a * b }.sum
    assert(math.abs(math.abs(dot) - 1.0) < 1e-3, s"top component off: dot=$dot")
  }

  test("falsifiability: a perturbed basis flips capture_ok, a broken spectrum flips spectrum_ok") {
    val embs = planted()
    val model = Pca.fit(embs, k = 2)
    // rotate the 2nd component out of the top eigenspace: orthonormality
    // survives (swap with a bottom eigenvector), variance capture must not
    val (_, allVecs) = Pca.eigenSym({
      // rebuild covariance from the model's own invariants is overkill —
      // fit again at full rank to get a bottom eigenvector
      val full = Pca.fit(embs, k = 8)
      Array.tabulate(8, 8)((i, j) =>
        full.components.zip(full.eigenvalues).map { case (v, e) => e * v(i) * v(j) }.sum)
    })
    val swapped = model.copy(components = Array(model.components(0), allVecs(7)))
    val r1 = Pca.pcaCheck(embs, swapped).collect().head
    assert(r1.getBoolean(3), "swap kept orthonormality")
    assert(!r1.getBoolean(6), "capture_ok must flip when Q leaves the top eigenspace")
    // non-orthonormal perturbation flips orthonormal_ok
    val bent = model.copy(components =
      Array(model.components(0).map(_ * 1.01), model.components(1)))
    assert(!Pca.pcaCheck(embs, bent).collect().head.getBoolean(3))
    // scrambled eigenvalues flip spectrum_ok
    val scrambled = model.copy(eigenvalues = model.eigenvalues.reverse)
    assert(!Pca.pcaCheck(embs, scrambled).collect().head.getBoolean(4))
  }

  test("projection parity: planted data reconstructs from its top-2 projection") {
    val embs = planted()
    val model = Pca.fit(embs, k = 2)
    val projSq = Pca.project(embs, model).collect()
      .map(r => r.getSeq[Double](1).map(x => x * x).sum).sum / 300.0
    // avg ||proj||^2 ~ avg ||x - mu||^2 (noise is ~1e-4 of the signal)
    assert(math.abs(projSq - model.trace) < 0.01 * model.trace)
  }

  test("driver testdata: embed_pca emits k scalar rows per vector") {
    val embs = Tables.embeddings(spark, TestSpark.sf)
    val n = embs.count()
    val out = Pca.embedPca(embs).collect()
    assert(out.length == n * 16)
    // scalar relation: (vec_id, component, value) — no array columns,
    // components densely 0..15 per vector
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    assert(!Pca.embedPca(embs).schema.exists(_.dataType.typeName == "array"))
  }
}
