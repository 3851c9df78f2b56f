package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus profiling & distribution diagnostics (SURVEY.md §2.8).
  *
  * Two operators a 100 TB pipeline runs constantly but that rarely get
  * first-class treatment:
  *
  *  - [[corpusReport]] — the dataset-card stats table (per language ×
  *    source: doc counts, char volumes, corpus shares). Every training
  *    run publishes one; it is also the input to the `corpus_mix`
  *    weighting decision.
  *  - [[keySkewReport]] — heavy-hitter detection over a join/agg key.
  *    At scale the FIRST question about a misbehaving shuffle is "is
  *    the key skewed, and by how much?"; the answer decides salting
  *    factors and AQE skew thresholds (see RobustnessSpec's skew-join
  *    pin). This makes that answer a query instead of a log-dive.
  *
  * Scale shape: both are one partial-agg'd shuffle over a SMALL key
  * space (languages × sources, resp. distinct keys) plus a broadcast of
  * a 1-row global-stats aggregate back onto the result — the corpus is
  * scanned once, nothing wide ever carries rows proportional to the
  * input. In `keySkewReport` the per-key counts feed BOTH the top-N heap
  * and the global stats; the two branches are the identical subplan, so
  * Spark's ReuseExchange materializes the groupBy shuffle once and the
  * second branch reads it for free (pinned in PlanSpec).
  */
object Profile {

  /** Per (lang, source) dataset-card stats over `documents`. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val total = docs.agg(count(lit(1)).as("total_docs"))
    docs.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        col("avg_chars"), col("min_chars"), col("max_chars"),
        round(col("n_docs").cast("double") / col("total_docs"), 6).as("doc_share"))
      .orderBy(col("lang"), col("source"))
  }

  /** The dataset-card MATRIX view: doc counts as a lang × source WIDE
    * relation via Spark's pivot — the cross-tab a data report renders
    * directly (the long `corpusReport` relation is the machine-readable
    * twin). The pivot value list is EXPLICIT: pivot without values runs
    * an extra distinct-collection job on the driver and silently caps at
    * `spark.sql.pivotMaxValues` — at 100 TB the report schema is a
    * CONTRACT, not a discovery (a new source appearing mid-crawl should
    * fail loudly in review, not grow a column). One partial-agg'd
    * shuffle on `lang`; each group folds its |sources| conditional
    * counts map-side.
    */
  def corpusPivot(docs: DataFrame,
                  sources: Seq[String] = (0 until 20).map(i => s"src$i")): DataFrame =
    docs.groupBy(col("lang"))
      .pivot("source", sources)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("lang"))

  /** Top-N heaviest keys of `df` under `keyCol`, each with its share of
    * the mean key frequency (`skew_ratio` — the number you compare to an
    * AQE skew threshold or turn into a salting factor).
    */
  def keySkewReport(df: DataFrame, keyCol: String = "user_id", topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), round(avg(col("cnt")), 6).as("avg_cnt"))
    counts
      .orderBy(col("cnt").desc, col(keyCol)) // deterministic at the LIMIT boundary
      .limit(topN)
      .crossJoin(broadcast(stats))
      .select(col(keyCol), col("cnt"),
        round(col("cnt") / col("avg_cnt"), 6).as("skew_ratio"),
        col("n_keys"))
      .orderBy(col("cnt").desc, col(keyCol))
  }

  /** Doc-length (whitespace-token) distribution in log2 buckets — the
    * dataset-card histogram that decides packing `seqLen` and truncation
    * policy. The bucket is computed INTEGER-ONLY as
    * `length(bin(n+1)) - 1` (= floor(log2(n+1))): both engines' binary
    * string of a bigint is unpadded, so the bucketing can never drift on
    * a libm `log2` rounding at a power-of-2 boundary (Spark's
    * log-division returns 2.9999... for log2(8) on some JVMs; a float
    * floor there would hash-mismatch the oracle). Map-only + one tiny
    * agg; token counting is the same fused native TokenStats pass as
    * `text_tokencount`.
    */
  def docLengthHistogram(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      graft.functions.TokenStats.tokenStats(col("text")).getField("n_tokens").as("n"))
    val total = toks.agg(count(lit(1)).as("total_docs"))
    toks.select((length(bin(col("n") + 1)) - 1).cast("long").as("bucket"), col("n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        col("min_tokens"), col("max_tokens"),
        round(col("n_docs").cast("double") / col("total_docs"), 6).as("doc_share"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_report" -> ((s, d) => corpusReport(Tables.documents(s, d))),
    "corpus_pivot" -> ((s, d) => corpusPivot(Tables.documents(s, d))),
    "key_skew_report" -> ((s, d) => keySkewReport(Tables.events(s, d))),
    "doc_length_histogram" -> ((s, d) => docLengthHistogram(Tables.documents(s, d))))

  val oracle: Map[String, String] = Map(
    // the pivot as conditional aggregation — same explicit column set
    "corpus_pivot" -> {
      val cells = (0 until 20).map(i =>
        s"CAST(sum(CASE WHEN source = 'src$i' THEN 1 ELSE 0 END) AS BIGINT) AS src$i")
        .mkString(",\n ")
      s"""SELECT lang,
         | $cells
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },
    "corpus_report" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | round(avg(n_chars), 6) AS avg_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        | round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents), 6) AS doc_share
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "doc_length_histogram" ->
      """WITH t AS (SELECT CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CAST(length(bin(n + 1)) - 1 AS BIGINT) AS bucket, n FROM t)
        |SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens,
        | min(n) AS min_tokens, max(n) AS max_tokens,
        | round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM t), 6) AS doc_share
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "key_skew_report" ->
      """WITH counts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |stats AS (SELECT count(*) AS n_keys, round(avg(cnt), 6) AS avg_cnt FROM counts)
        |SELECT c.user_id, c.cnt,
        | round(CAST(c.cnt AS DOUBLE) / s.avg_cnt, 6) AS skew_ratio, s.n_keys
        |FROM counts c, stats s
        |ORDER BY c.cnt DESC, c.user_id LIMIT 10""".stripMargin)
}
