package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE tokenizer training (SURVEY §2.7, training-pipeline
  * extension) — the merge-table learner of Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", reshaped for
  * a distributed corpus.
  *
  * Classic BPE is a single-machine loop over an in-memory word-count
  * table. The distributed formulation keeps the SAME algorithm but holds
  * the corpus-wide state where it belongs:
  *
  *  - the WORD-SHAPE relation (distinct word → current symbol string ×
  *    corpus frequency) lives distributed — at 100 TB the distinct-word
  *    space is millions of rows, but it is the corpus COMPRESSED to its
  *    frequency map, not the corpus itself; building it is one
  *    `vocab_topk`-shaped aggregation over the full scan, paid once;
  *  - each merge round is ONE aggregation over the shapes: explode
  *    adjacent symbol pairs, weight by word frequency, take the global
  *    max (deterministic tie-break: highest freq, then lexicographically
  *    smallest left then right symbol — training is reproducible);
  *  - the learned merge itself is DRIVER state by design: one row per
  *    round, the artifact a tokenizer ships;
  *  - applying a merge is a literal string `replace` over the shapes —
  *    pure codegen'd map work, no shuffle.
  *
  * Shapes are delimiter-encoded: symbols separated AND bounded by a
  * doubled `␟`, so the merge pattern `␟l␟␟r␟` (a) can never match
  * inside a longer symbol, and (b) leaves a `␟` on each side after every
  * replacement, which keeps BACK-TO-BACK occurrences matchable — one
  * left-to-right `replace` pass then merges "a a a a" into "aa aa"
  * exactly like the reference implementation's non-overlapping scan.
  * (Caveat: the corpus alphabet must not contain `␟`; a byte-level
  * production tokenizer would escape it first.)
  *
  * The shapes relation is re-materialized per round via localCheckpoint
  * (round N's plan must not embed rounds 1..N-1's replaces) with the
  * superseded round's blocks released eagerly — the
  * [[Corpus.connectedComponents]] lineage discipline.
  *
  * No driver query/oracle: merge learning is inherently iterative and
  * not single-statement SQL; the merge table is pinned by spec against
  * the hand-computed Sennrich example (BpeSpec) — the `lib` treatment,
  * like `mj_maple_juice_api`.
  */
object Bpe {

  /** One learned merge: rank = round it was learned in (0-based), the
    * two symbols joined, and the pair's weighted frequency at the time.
    */
  case class Merge(rank: Int, left: String, right: String, freq: Long)

  // The shape delimiter (U+001F) as a VISIBLE escape, not a raw control
  // char in source — the literal codepoint renders as an empty string in
  // editors/diffs, so accidental corruption would be invisible (ADVICE r5).
  private val S = "\u001f"
  private val EndWord = "</w>"

  /** `␟␟sym₁␟␟sym₂␟␟…␟␟</w>␟␟` — the delimiter-encoded symbol string. */
  private def shapeOf(word: Column): Column =
    concat(lit(S + S),
      concat_ws(S + S, concat(split(word, ""), array(lit(EndWord)))),
      lit(S + S))

  /** Distinct word → (shape, corpus freq): the training state. */
  private[operators] def wordShapes(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .select(explode(filter(split(col("text"), "\\s+"), w => w =!= lit(""))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(shapeOf(col("word")).as("shape"), col("freq"))

  /** Adjacent symbol pairs of `shape` as (left, right) structs. */
  private def pairsOf(shape: Column): Column = {
    val syms = filter(split(shape, S + S), s => s =!= lit(""))
    arrays_zip(slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1))
  }

  /** Train `numMerges` BPE merges over the corpus' whitespace words. */
  def train(docs: DataFrame, numMerges: Int = 50): Seq[Merge] = {
    var shapes = wordShapes(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    // finally-release: a throw mid-round (executor loss, cancelled job)
    // must not leave the current shapes checkpoint pinned — the same
    // throw-path discipline as connectedComponents
    try while (round < numMerges && !exhausted) {
      val top = shapes
        .select(col("freq"), explode(pairsOf(col("shape"))).as("p"))
        .groupBy(col("p.0").as("left"), col("p.1").as("right"))
        .agg(sum(col("freq")).as("pfreq"))
        .orderBy(col("pfreq").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(round, l, r, f)
        val next = shapes
          .select(replace(col("shape"),
            lit(S + l + S + S + r + S), lit(S + l + r + S)).as("shape"), col("freq"))
          .localCheckpoint(true)
        Corpus.releaseCheckpoint(shapes)
        shapes = next
        round += 1
      }
    } finally Corpus.releaseCheckpoint(shapes)
    merges.toList
  }

  /** Tokenize one word with a learned merge table (driver-side utility —
    * the spec's round-trip check; production application runs the same
    * replace chain inside a map over the scan).
    */
  def applyMerges(word: String, merges: Seq[Merge]): Seq[String] = {
    var shape = S + S + (word.split("").toSeq :+ EndWord).mkString(S + S) + S + S
    for (m <- merges.sortBy(_.rank))
      shape = shape.replace(S + m.left + S + S + m.right + S, S + m.left + m.right + S)
    shape.split(S + S).toSeq.filter(_.nonEmpty)
  }
}
