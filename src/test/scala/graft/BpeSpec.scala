package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge learner against the hand-computed Sennrich
  * example corpus (low×5, lower×2, newest×6, widest×3). Pair counts,
  * winners and tie-breaks are worked out by hand in the comments — a
  * regression in pair weighting, the deterministic tie-break, or the
  * replace-encoded merge application changes the table.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    // one doc per word occurrence — shapes aggregate to the freq map
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("learns the hand-computed merge table with deterministic tie-breaks") {
    // round 0: (e,s)=9, (s,t)=9, (t,</w>)=9 tie → lex smallest left: e s
    // round 1: (es,t)=9, (t,</w>)=9 tie → es t
    // round 2: (est,</w>)=9 → est </w>
    // round 3: (l,o)=7, (o,w)=7 tie → l o
    // round 4: (lo,w)=7 → lo w
    val merges = Bpe.train(corpus, numMerges = 5)
      .map(m => (m.rank, m.left, m.right, m.freq))
    assert(merges == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("applyMerges round-trips: learned table tokenizes a held-out word") {
    val merges = Bpe.train(corpus, numMerges = 5)
    // "lowest" was never a corpus word, but its pieces were learned
    assert(Bpe.applyMerges("lowest", merges) == Seq("low", "est</w>"))
    assert(Bpe.applyMerges("low", merges) == Seq("low", "</w>"))
  }

  test("back-to-back pair occurrences merge in one pass (aaaa -> aa aa)") {
    import spark.implicits._
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(d, numMerges = 1)
    assert(m.head.left == "a" && m.head.right == "a" && m.head.freq == 3L)
    assert(Bpe.applyMerges("aaaa", m) == Seq("aa", "aa", "</w>"))
  }

  test("training exhausts gracefully when every pair is merged") {
    import spark.implicits._
    val d = Seq((1L, "ab")).toDF("doc_id", "text")
    // round 0: (a,b) vs (b,</w>) tie → lex picks (a,b); round 1:
    // (ab,</w>); round 2: single symbol left, no pairs → stop at 2
    val m = Bpe.train(d, numMerges = 10)
    assert(m.length == 2)
    assert(Bpe.applyMerges("ab", m) == Seq("ab</w>"))
  }
}
