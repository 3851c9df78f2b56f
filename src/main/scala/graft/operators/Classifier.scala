package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Supervised hashed-n-gram linear classifier over `documents`
  * (SURVEY.md §2.5) — the TRAINED counterpart of the heuristic
  * quality/langid scorers, i.e. the fastText-style model shape real
  * training-data pipelines deploy for quality and topicality filters
  * (a linear model over hashed bag-of-n-gram features; cf. Joulin et
  * al., "Bag of Tricks for Efficient Text Classification", 2016).
  *
  * The reference has no model trainer — this extends its query surface
  * the way the PCA/BPE/IVF trainers do, under SURVEY §5's model-fitting
  * rule: EVERY pass is bounded-state.
  *
  *  - Featurization is declarative and map-only: distinct uni- and
  *    bi-gram hashes (the [[graft.functions.Shingles]] kernel the dedup
  *    operators share) folded into `Dim` buckets — one narrow
  *    `array<int>` column off the scan, no shuffle, no vocabulary
  *    (hashing trick: the feature space is fixed a priori, so there is
  *    no corpus-sized dictionary to build, broadcast, or keep in sync —
  *    THE property that lets the same featurizer run unchanged on a
  *    100 TB corpus and inside a streaming micro-batch).
  *  - Training is full-batch logistic regression: `Iters` passes over
  *    the persisted train split, each ONE `treeAggregate` producing a
  *    `Dim+1`-double gradient (~32 KB per task at Dim=4096) — driver
  *    state scales with the MODEL, never the data (the
  *    [[Pca.fit]] moment-pass shape). At 100 TB the train relation is
  *    a labeled sample by construction (labels are the scarce input),
  *    so the iterated pass is over the sample, and scoring — the
  *    corpus-sized side — is a single broadcast-model map.
  *  - Scoring broadcasts the weight vector and runs one typed
  *    Tungsten `mapPartitions` over every doc ([[Pca.project]]'s
  *    pattern): embarrassingly parallel, no exchange.
  *
  * The demonstration task must be honest on the synthetic corpus: the
  * `lang`/`source` columns are metadata noise (uniform token
  * distributions — nothing textual predicts them), and the heuristic
  * quality gate passes ~96% of docs (any floor under its base rate
  * would be vacuous). The label here is balanced (~50%) and genuinely
  * textual: "the token `spark` occurs at least twice" — a topicality
  * proxy where single-feature presence is insufficient (one mention
  * sets the same unigram bit as five), so the model must exploit
  * bigram-context features to clear its floors. Split is a
  * deterministic doc_id hash (80/20); the check twin pins held-out
  * accuracy ≥ [[HoldoutFloor]] against DuckDB-computed real
  * denominators — a generalization statement, not a train-fit echo.
  *
  * Weights are an iterative float fixpoint (combine-order sensitive at
  * ~1e-15), so `text_classifier` is rows-only by design and its
  * CONTRACT is the oracle-checked `text_classifier_check` twin — the
  * minhash/simhash/ANN/PCA pairing discipline.
  */
object Classifier {

  /** Hashed feature-space size. 4096 keeps the gradient ~32 KB; a
    * production quality filter raises it to 2^18-2^20 — still KBs of
    * driver state per aggregate, the knob is free until the gradient
    * rivals a shuffle partition. */
  val Dim = 4096
  val Iters = 60
  val Lr = 0.5
  val L2 = 1e-4
  /** Check-twin floors: well above the ~0.55 majority-class baseline
    * and ≥8pp under the measured accuracy at every test SF (sf0.001 /
    * 0.01 / 0.1), so they fail on a broken trainer, not on seed drift.
    */
  val TrainFloor = 0.80
  val HoldoutFloor = 0.68

  /** Linear model: `w` holds Dim feature weights + the bias at w(Dim).
    * All driver/broadcast state — O(model), independent of corpus. */
  case class LrModel(w: Array[Double], dim: Int, nTrain: Long)

  private[graft] def labelCol(text: Column): Column =
    size(filter(split(coalesce(text, lit("")), "\\s+"), t => t === lit("spark"))) >= 2

  /** The label as DuckDB SQL — ONE definition interpolated into every
    * oracle that re-states it (`text_classifier_check` here AND the
    * streaming twin's `stream_ingest_classify_check`), so an edit to
    * [[labelCol]] has exactly two places to touch (the Column and this
    * string), not three diverging SQL copies (ADVICE r11). */
  private[graft] val labelSql: String =
    """len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
      |   x -> x = 'spark')) >= 2""".stripMargin

  /** Distinct uni+bigram hashes folded into [[Dim]] buckets — binary
    * presence features as a sorted-free `array<int>`, one codegen'd
    * expression chain inside the scan task. */
  private[graft] def featureCol(text: Column, dim: Int = Dim): Column = {
    val t = coalesce(text, lit(""))
    array_distinct(transform(
      array_union(graft.functions.ShingleFunctions.shingleHashes(t, 1),
        graft.functions.ShingleFunctions.shingleHashes(t, 2)),
      h => pmod(h, lit(dim.toLong)).cast("int")))
  }

  /** `(doc_id, label, split, idx)` — the labeled, split, featurized
    * relation both the trainer and the scorer read. Split is hashed
    * off doc_id (deterministic, content-independent). */
  private[graft] def featurized(docs: DataFrame, dim: Int = Dim): DataFrame =
    docs.select(col("doc_id"),
      labelCol(col("text")).as("label"),
      when(pmod(col("doc_id"), lit(5L)) === 0, "holdout").otherwise("train").as("split"),
      featureCol(col("text"), dim).as("idx"))

  /** Full-batch logistic GD: [[Iters]] × one treeAggregate over the
    * persisted train split. Gradient state per task is `dim+1` doubles;
    * the driver applies the step and re-broadcasts — the MLlib
    * linear-model shape, with the same depth-2 combine as [[Pca.fit]].
    */
  def fit(featurized: DataFrame, dim: Int = Dim, iters: Int = Iters): LrModel = {
    val spark = featurized.sparkSession
    val rows = featurized.filter(col("split") === "train")
      .select(col("label").cast("double"), col("idx"))
      .rdd.map(r => (r.getDouble(0), r.getSeq[Int](1).toArray))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var w = new Array[Double](dim + 1)
      var nTrain = 0L
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(w)
        val (grad, n) = rows.treeAggregate((new Array[Double](dim + 1), 0L))(
          seqOp = { case ((g, cnt), (y, idx)) =>
            val wv = bc.value
            var m = wv(dim); var i = 0
            while (i < idx.length) { m += wv(idx(i)); i += 1 }
            val d = 1.0 / (1.0 + math.exp(-m)) - y
            i = 0
            while (i < idx.length) { g(idx(i)) += d; i += 1 }
            g(dim) += d
            (g, cnt + 1)
          },
          combOp = { case ((g1, n1), (g2, n2)) =>
            var i = 0; while (i < g1.length) { g1(i) += g2(i); i += 1 }
            (g1, n1 + n2)
          },
          depth = 2)
        bc.destroy()
        nTrain = n
        require(n > 0, "text_classifier: empty train split")
        val w2 = w.clone()
        var i = 0
        while (i < dim) { w2(i) -= Lr * (grad(i) / n + L2 * w(i)); i += 1 }
        w2(dim) -= Lr * (grad(dim) / n) // no L2 on the bias
        w = w2
      }
      LrModel(w, dim, nTrain)
    } finally rows.unpersist(blocking = false)
  }

  /** Broadcast-model scoring: `(doc_id, label, split, prob, pred)` for
    * EVERY doc, one typed map stage, no exchange. The model broadcast
    * is released by GC with the returned (lazy) relation; a LOOP that
    * scores repeatedly uses [[scoreWithHandle]] and destroys the
    * broadcast once the scored relation is materialized — one
    * never-released broadcast per epoch otherwise accumulates until a
    * driver GC (ADVICE r11; [[fit]] already destroys per-iteration
    * broadcasts). */
  def score(featurized: DataFrame, model: LrModel): DataFrame =
    scoreWithHandle(featurized, model)._1

  /** [[score]] returning the model broadcast too, so a caller that
    * EAGERLY consumes the relation (write, collect) can destroy it —
    * the lifecycle a long-running scoring loop needs. */
  private[graft] def scoreWithHandle(featurized: DataFrame, model: LrModel)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[LrModel]) = {
    val spark = featurized.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val scored = featurized.select(col("doc_id"), col("label"), col("split"), col("idx"))
      .as[(Long, Boolean, String, Array[Int])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, y, sp, idx) =>
          var z = m.w(m.dim); var i = 0
          while (i < idx.length) { z += m.w(idx(i)); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          (id, y, sp, math.rint(p * 1e6) / 1e6, p >= 0.5)
        }
      }
      .toDF("doc_id", "label", "split", "prob", "pred")
    (scored, bc)
  }

  /** Persist a fitted model as SPARSE `(idx, weight)` rows — only
    * non-zero weights, absent means zero, column-name-addressed so a
    * layout change can never silently transpose the vector — plus an
    * `idx = -1` sentinel row carrying the weight-row count. The
    * sentinel pins the sparsity invariant: a future writer that drops
    * rows (L1 pruning, quantization) without updating the contract
    * makes [[loadModel]] fail loudly instead of zero-filling real
    * weights away. */
  private[graft] def storeModel(spark: SparkSession, model: LrModel, dir: String): Unit = {
    import spark.implicits._
    val sparse = model.w.zipWithIndex
      .collect { case (v, i) if v != 0.0 => (i, v) }.toSeq
    (sparse :+ ((-1, sparse.size.toDouble)))
      .toDF("idx", "weight")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a [[storeModel]]-written model, enforcing the sentinel's
    * sparse-weight contract (exactly one meta row, its count equal to
    * the weight rows present). */
  private[graft] def loadModel(spark: SparkSession, dir: String): LrModel = {
    val rows = spark.read.parquet(dir).select(col("idx"), col("weight")).collect()
    val (meta, weights) = rows.partition(_.getInt(0) < 0)
    require(meta.length == 1 &&
      meta.head.getDouble(1).toLong == weights.length.toLong,
      s"classifier model store violated its sparse-weight contract: " +
        s"${meta.length} meta rows, ${weights.length} weight rows vs " +
        s"recorded ${meta.headOption.map(_.getDouble(1))}")
    val w = new Array[Double](Dim + 1)
    weights.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    LrModel(w, Dim, 0L)
  }

  /** The `text_classifier` query: featurize, fit on the train split,
    * score the whole corpus. */
  def classify(spark: SparkSession, d: String): DataFrame = {
    val feats = featurized(Tables.documents(spark, d))
    score(feats, fit(feats)).orderBy(col("doc_id"))
  }

  /** Contract verdict for [[classify]]: real denominators the oracle
    * recomputes from the raw table (doc/split/label counts — ties the
    * relation to the data), plus the pinned model contracts: every
    * probability in [0,1], train accuracy ≥ [[TrainFloor]], held-out
    * accuracy ≥ [[HoldoutFloor]]. The floors are falsifiable: an
    * untrained (zero-weight) model scores 0.5 everywhere and fails
    * both (ClassifierSpec pins the flip). */
  def classifyCheck(spark: SparkSession, d: String): DataFrame = {
    val scored = classify(spark, d).persist()
    def accOf(split: String): Column =
      sum(when(col("split") === split && col("pred") === col("label"), 1L)
        .otherwise(0L)).cast("double") /
        sum(when(col("split") === split, 1L).otherwise(0L))
    val verdict = scored.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "holdout", 1L).otherwise(0L)).as("n_holdout"),
      sum(when(col("label"), 1L).otherwise(0L)).as("n_label_pos"),
      sum(when(col("prob") < 0.0 || col("prob") > 1.0, 1L).otherwise(0L))
        .as("n_prob_oob"),
      (accOf("train") >= TrainFloor).as("train_acc_ok"),
      (accOf("holdout") >= HoldoutFloor).as("holdout_acc_ok"))
    Tables.materializeAndRelease(verdict, scored)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_classifier" -> classify,
    "text_classifier_check" -> classifyCheck)

  val oracle: Map[String, String] = Map(
    // the main relation is rows-only (iterative float weights); the
    // check twin recomputes every denominator from the raw table and
    // pins the model contracts
    "text_classifier_check" ->
      s"""WITH t AS (SELECT doc_id,
        | $labelSql AS label,
        | CASE WHEN doc_id % 5 = 0 THEN 'holdout' ELSE 'train' END AS split
        |FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(*) FILTER (split = 'train') AS BIGINT) AS n_train,
        | CAST(count(*) FILTER (split = 'holdout') AS BIGINT) AS n_holdout,
        | CAST(count(*) FILTER (label) AS BIGINT) AS n_label_pos,
        | CAST(0 AS BIGINT) AS n_prob_oob,
        | TRUE AS train_acc_ok,
        | TRUE AS holdout_acc_ok
        |FROM t""".stripMargin)
}
