package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus (SURVEY.md §2.4).
  *
  * Dimensionality reduction is the standard precursor to ANN indexing at
  * scale (FAISS's OPQ/PCA pre-transform): projecting 64-dim embeddings
  * onto their top-k principal directions shrinks every downstream
  * index/scan by dim/k while keeping most of the variance. This is the
  * classic one-pass distributed formulation:
  *
  *  1. ONE `treeAggregate` pass accumulates (n, Σx, upper-tri ΣxxT) —
  *     d(d+3)/2 doubles of state per task (~17 KB at d=64), combined
  *     tree-wise so the driver receives O(executors^(1/depth)) partial
  *     states, never data. The corpus is scanned once and never
  *     shuffled.
  *  2. The d×d covariance eigendecomposes ON THE DRIVER via cyclic
  *     Jacobi rotations — O(d³) on a 64×64 matrix is microseconds;
  *     driver state is bounded by the model, not the data (same rule as
  *     the ANN codebooks' bounded-sample training).
  *  3. The k×d projection matrix broadcasts and the projection itself is
  *     a typed map over Tungsten rows — embarrassingly parallel, no
  *     exchange.
  *
  * Eigenvectors are an iterative fixpoint (sign/rotation ambiguous in
  * SQL terms), so `embed_pca` is rows-only by design and its CONTRACT is
  * the oracle-checked `embed_pca_check` twin — the same pairing
  * discipline as minhash/simhash/ANN:
  *
  *  - `cov_ok`: avg‖x−μ‖² == trace(C) (ties the aggregate pass to the
  *    data — a covariance bug breaks the Pythagorean bookkeeping),
  *  - `capture_ok`: avg‖Qᵀ(x−μ)‖² == Σ top-k eigenvalues. For ANY
  *    orthonormal Q, avg‖Qᵀ(x−μ)‖² = trace(QᵀCQ) ≤ Σ_topk λ with
  *    equality iff Q spans the top eigenspace — so this single scalar
  *    verifies Q is THE variance-maximizing basis, not just orthonormal
  *    (falsifiability spec-pinned: a perturbed or rotated-out basis
  *    fails it),
  *  - `orthonormal_ok` / `spectrum_ok`: max|QQᵀ−I|, eigenvalues sorted,
  *    non-negative, Σλ == trace (driver-side exact checks of the
  *    eigensolver).
  */
object Pca {

  /** Fitted model: everything downstream needs, all O(d²) driver state. */
  case class PcaModel(n: Long, mean: Array[Double],
                      components: Array[Array[Double]], // k rows, each length d
                      eigenvalues: Array[Double],       // all d, descending
                      trace: Double) {
    def d: Int = mean.length
    def k: Int = components.length
    def topSum: Double = eigenvalues.take(k).sum
  }

  // ------------------------------------------------------- driver linalg

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix (standard
    * textbook form, cf. Golub & Van Loan §8.5). Returns (eigenvalues
    * descending, matching unit eigenvectors as ROWS), each row's
    * largest-|component| entry made positive so the basis is
    * deterministic up to the covariance itself.
    */
  private[graft] def eigenSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val scale = math.max(1e-300, m.indices.map(i => math.abs(m(i)(i))).max)
    var sweep = 0
    while (sweep < 64 && off() > 1e-24 * scale * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = {
              val s = if (theta >= 0) 1.0 else -1.0
              s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) { // rotate rows/cols p,q of a
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eig = order.map(i => a(i)(i)).toArray
    val rows = order.map { c =>
      val row = Array.tabulate(d)(r => v(r)(c))
      val mx = row.indices.maxBy(i => math.abs(row(i)))
      if (row(mx) < 0) row.map(-_) else row
    }.toArray
    (eig, rows)
  }

  // ------------------------------------------------------------- fitting

  /** One-pass moment accumulation → covariance → driver eigensolve. */
  def fit(embeddings: DataFrame, k: Int = 16): PcaModel = {
    val rows = Similarity.vecs(embeddings).select(col("v"))
      .rdd.map(_.getSeq[Double](0))
    // (n, Σx, upper-tri Σ x xT) — mutable per-partition accumulator,
    // tree-combined (depth 2 = the multi-executor aggregation shape)
    val d0 = rows.take(1).headOption.map(_.length)
      .getOrElse(throw new IllegalArgumentException("PCA over an empty relation"))
    type Acc = (Long, Array[Double], Array[Double])
    val zero: Acc = (0L, new Array[Double](d0), new Array[Double](d0 * (d0 + 1) / 2))
    val (n, s, ss) = rows.treeAggregate(zero)(
      seqOp = { case ((cnt, sum, outer), x) =>
        require(x.length == d0, s"ragged embedding: ${x.length} != $d0")
        var i = 0; var idx = 0
        while (i < d0) {
          val xi = x(i)
          sum(i) += xi
          var j = i
          while (j < d0) { outer(idx) += xi * x(j); idx += 1; j += 1 }
          i += 1
        }
        (cnt + 1, sum, outer)
      },
      combOp = { case ((n1, s1, o1), (n2, s2, o2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < o1.length) { o1(i) += o2(i); i += 1 }
        (n1 + n2, s1, o1)
      },
      depth = 2)
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d0, d0)
    var i = 0; var idx = 0
    while (i < d0) {
      var j = i
      while (j < d0) {
        val c = ss(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (eig, vecs) = eigenSym(cov)
    PcaModel(n, mean, vecs.take(math.min(k, d0)), eig, (0 until d0).map(i => cov(i)(i)).sum)
  }

  /** Map-only projection of every embedding onto the model's components:
    * `(vec_id, proj: array<double>[k])`, 6dp-rounded. The model
    * broadcasts; rows stream through one typed Tungsten stage.
    */
  def project(embeddings: DataFrame, model: PcaModel): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    Similarity.vecs(embeddings).as[VecRow]
      .mapPartitions { it =>
        val m = bc.value
        it.map { r =>
          val proj = new Array[Double](m.k)
          var c = 0
          while (c < m.k) {
            val comp = m.components(c)
            var acc = 0.0; var i = 0
            while (i < m.d) { acc += (r.v(i) - m.mean(i)) * comp(i); i += 1 }
            proj(c) = math.rint(acc * 1e6) / 1e6
            c += 1
          }
          (r.vec_id, proj)
        }
      }
      .toDF("vec_id", "proj")
  }

  /** The `embed_pca` query: fit on the corpus, project the corpus.
    * The relation is SCALAR — `posexplode` unrolls each projection to
    * `(vec_id, component, value)` rows — because a raw `array<double>`
    * column is unsortable/unhashable for generic result recorders
    * (pandas dies on ndarray cells); library callers wanting vectors
    * use [[project]] directly (the [[Similarity.annPcaTopK]] path).
    * The unroll is a generator inside the same scan task as the
    * projection — no extra shuffle, output is k scalar rows per vector.
    */
  def embedPca(embeddings: DataFrame, k: Int = 16): DataFrame =
    project(embeddings, fit(embeddings, k))
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("component", "value")))
      .orderBy(col("vec_id"), col("component"))

  /** Contract verdict for [[embedPca]] (see object doc for why each
    * invariant is falsifiable). Takes the model as a parameter so the
    * spec can inject a perturbed basis and watch the verdict flip.
    */
  def pcaCheck(embeddings: DataFrame, model: PcaModel, relTol: Double = 1e-6): DataFrame = {
    val meanLit = array(model.mean.map(lit): _*)
    // avg ‖Qᵀ(x−μ)‖² over the projected relation (reuses the projection
    // code path under test)
    val projSq = project(embeddings, model)
      .select(aggregate(col("proj"), lit(0.0), (acc, x) => acc + x * x).as("ps"))
      .agg(avg(col("ps")).as("avg_proj_sq"), count(lit(1)).as("n_vectors"))
    // avg ‖x−μ‖² straight off the scan (no shuffle; native HOFs)
    val totalSq = Similarity.vecs(embeddings)
      .select(aggregate(zip_with(col("v"), meanLit, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("ts"))
      .agg(avg(col("ts")).as("avg_total_sq"))
    // driver-side exact checks of the eigensolver
    val q = model.components
    val orthoErr = (for (i <- q.indices; j <- q.indices) yield {
      val dot = (0 until model.d).map(t => q(i)(t) * q(j)(t)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    val sortedOk = model.eigenvalues.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12)
    val nonnegOk = model.eigenvalues.forall(_ >= -1e-9 * math.max(1.0, model.trace))
    val traceOk = math.abs(model.eigenvalues.sum - model.trace) <= 1e-9 * math.max(1.0, model.trace)
    val tol = lit(relTol * math.max(1.0, model.trace))
    projSq.crossJoin(totalSq).select(
      col("n_vectors"),
      lit(model.d.toLong).as("dim"),
      lit(model.k.toLong).as("k"),
      lit(orthoErr < 1e-8).as("orthonormal_ok"),
      lit(sortedOk && nonnegOk && traceOk).as("spectrum_ok"),
      (abs(col("avg_total_sq") - lit(model.trace)) <= tol).as("cov_ok"),
      (abs(col("avg_proj_sq") - lit(model.topSum)) <= tol).as("capture_ok"))
  }

  def embedPcaCheck(embeddings: DataFrame, k: Int = 16): DataFrame =
    pcaCheck(embeddings, fit(embeddings, k))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca" -> ((s, d) => embedPca(Tables.embeddings(s, d))),
    "embed_pca_check" -> ((s, d) => embedPcaCheck(Tables.embeddings(s, d))))

  val oracle: Map[String, String] = Map(
    // embed_pca itself is rows-only (iterative eigenbasis); its contract
    // is the check twin below
    "embed_pca_check" ->
      """SELECT count(*) AS n_vectors,
        | CAST(max(len(embedding)) AS BIGINT) AS dim,
        | CAST(16 AS BIGINT) AS k,
        | true AS orthonormal_ok, true AS spectrum_ok,
        | true AS cov_ok, true AS capture_ok
        |FROM embeddings""".stripMargin)
}
