package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the non-SQL-oracled dedup ops (SURVEY §2.3): MinHash-LSH and
  * SimHash are defined by their relationship to exact Jaccard / exact
  * Hamming on the same corpus.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup keeps min doc_id and counts duplicates") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val got = Dedup.exact(d).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet // (keep_id, dup_count)
    assert(got == Set((1L, 3L), (2L, 1L)))
  }

  test("ngram jaccard: identical docs pair at 1.0, disjoint docs don't pair") {
    val d = docs(
      1L -> "one two three four five",
      2L -> "one two three four five",
      3L -> "six seven eight nine ten")
    val pairs = Dedup.ngramJaccard(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("ngram jaccard df cap drops pairs that only share ultra-common shingles") {
    val d = docs(
      1L -> "a b c d e",
      2L -> "a b c d e",
      3L -> "a b c q r")
    // shingle "a b c" appears in all 3 docs; cap df at 2 removes it
    val capped = Dedup.ngramJaccard(d, threshold = 0.1, maxShingleDf = Some(2)).collect()
    val uncapped = Dedup.ngramJaccard(d, threshold = 0.1).collect()
    assert(uncapped.length >= capped.length)
    // identical docs still pair via their unique shingles
    assert(capped.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("df cap bounds pair counts on a boilerplate-heavy corpus") {
    // 20 docs sharing a 10-token boilerplate prefix + a unique suffix:
    // the 8 boilerplate shingles each have df=20, so the uncapped
    // inverted-index join emits all C(20,2)=190 pairs — the k² blowup a
    // shared header/footer causes at corpus scale. Capping df at 5 drops
    // exactly those shingles (every other shingle has df=1), bounding
    // the join's output to zero pairs.
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val d = docs((1L to 20L).map(i => i -> s"$boiler u${i}a u${i}b u${i}c"): _*)
    val uncapped = Dedup.ngramJaccard(d, threshold = 0.5).count()
    val capped = Dedup.ngramJaccard(d, threshold = 0.5, maxShingleDf = Some(5)).count()
    assert(uncapped == 190L, s"boilerplate should pair everything, got $uncapped")
    assert(capped == 0L, s"df cap should drop every boilerplate-only pair, got $capped")
  }

  test("minhash-LSH finds the exact-jaccard pairs on the documents table (high recall, perfect precision)") {
    val d = graft.Tables.documents(spark, TestSpark.sf)
    val exact = Dedup.ngramJaccard(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    // precision 1.0 by construction: every emitted pair is exact-verified
    assert(lsh.subsetOf(exact))
    // banding theory: P(candidate | j>=0.8) >= 0.94 -> recall well above 0.8
    assert(lsh.size.toDouble / exact.size >= 0.8)
  }

  test("band df cap drops the template flood's pairs and keeps cold pairs") {
    // VERDICT r15 #2: a flooded (band_id, band_hash) bucket costs
    // |bucket|² in the candidate join. 12 byte-identical template docs
    // share ALL 16 bands (identical signatures), so every bucket holding
    // one holds all 12 — with cap 8 they all go hot and the flood's
    // C(12,2)=66 pairs die in the anti-join, while an unrelated cold
    // near-dup pair survives untouched with its exact score.
    val flood = (1L to 12L).map(i => i -> "the same boilerplate template text here")
    // 20 shared tokens + a differing last one: 19 shingles each, exactly
    // one differs → jac = 18/20 = 0.9, and near-identical signatures
    // make the band collision deterministic-in-practice (≥1 of 16
    // bands agree; the hashes are fixed, so the outcome never flakes)
    val common = (1 to 20).map(i => s"t$i").mkString(" ")
    val cold = Seq(100L -> s"$common zeta", 101L -> s"$common eta")
    val d = docs(flood ++ cold: _*)
    val uncapped = Dedup.minhashLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLsh(d, maxBandDf = Some(8)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(uncapped.size == 66 + 1, s"uncapped should emit the flood + the cold pair, got ${uncapped.size}")
    assert(capped.toSeq == Seq((100L, 101L, 0.9)),
      s"capped should keep ONLY the cold pair with its exact score, got ${capped.toSeq}")
  }

  test("capped LSH check verdict: all invariants green on the documents table, and the cap meter can fail") {
    val d = graft.Tables.documents(spark, TestSpark.sf)
    val row = Dedup.minhashLshCappedCheck(d).collect().head
    assert(row.getLong(0) > 0, "flood-augmented corpus must have exact pairs")
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L,
      s"capped precision invariants broke: $row")
    assert(row.getLong(3) == 0L, s"a flood pair leaked through the cap: $row")
    assert(row.getBoolean(4), "cap_binds must hold — the planted flood must bite")
    assert(row.getBoolean(5), s"capped recall under floor on the cold remainder: $row")
    // the meter is falsifiable: a cap no bucket reaches cannot bind
    val inert = Dedup.minhashLshCappedCheck(d, maxBandDf = 10000).collect().head
    assert(!inert.getBoolean(4), "an unreachable cap must read cap_binds=false")
  }

  test("native minhash signature is bit-identical to the explode + grouped-min twin") {
    // the fused map kernel replaced a shuffle; its VALUES must not move
    // (h1 = shingle as double, h2 = xxhash64(shingle, 1) as double,
    // m_i = min(h1 + i*h2) — the exact relational formulation below)
    import org.apache.spark.sql.functions.{col, explode, lit, min, xxhash64}
    val perms = 16
    val shingled = Dedup.shingleHashSets(graft.Tables.documents(spark, TestSpark.sf))
    val native = Dedup.minhashSignatures(shingled, perms).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val twin = shingled
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), col("s").cast("double").as("h1"),
        xxhash64(col("s"), lit(1)).cast("double").as("h2"))
      .groupBy(col("doc_id"))
      .agg(min(col("h1")).as("m0"),
        (1 until perms).map(i => min(col("h1") + lit(i.toDouble) * col("h2")).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to perms).map(i => r.getDouble(i))).toMap
    assert(native.keySet == twin.keySet)
    // bit-identical, not approximately equal: same hash fold, same
    // one-mult-one-add per permutation
    native.foreach { case (id, sig) => assert(sig == twin(id), s"doc $id") }
    // empty shingle set → null signature → row dropped, like the
    // grouped form emitting no row; null ELEMENTS are skipped (the twin's
    // min() ignores null h1/h2), so an all-null array also drops
    import spark.implicits._
    val empty = Seq((1L, Seq.empty[Long]), (2L, Seq(7L, 8L))).toDF("doc_id", "shingles")
    assert(Dedup.minhashSignatures(empty, perms).collect().map(_.getLong(0)).toSeq == Seq(2L))
    val withNulls = Seq((3L, Seq[Option[Long]](Some(7L), None, Some(8L))),
      (4L, Seq[Option[Long]](None))).toDF("doc_id", "shingles")
    val got = Dedup.minhashSignatures(withNulls, perms).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L), "all-null set must drop")
    val clean = Seq((3L, Seq(7L, 8L))).toDF("doc_id", "shingles")
    assert(got.head.getSeq[Double](1) ==
      Dedup.minhashSignatures(clean, perms).head.getSeq[Double](1),
      "null elements must be skipped, not read as phantom shingles")
  }

  test("minhash-LSH containment verdict: zero false pairs, zero drift, recall over floor") {
    // the oracle-checkable form of the sketch op: one row of exact
    // invariants the driver hash-matches against the exact pairs CTE
    val row = Dedup.minhashLshCheck(graft.Tables.documents(spark, TestSpark.sf)).head()
    assert(row.getLong(0) > 0, "corpus should contain planted near-dups")
    assert(row.getLong(1) == 0L, s"false pairs: $row")
    assert(row.getLong(2) == 0L, s"jaccard drift between sketch and exact path: $row")
    assert(row.getBoolean(3), s"recall under floor: $row")
  }

  test("simhash: identical docs at hamming 0; near-identical docs within threshold") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "the quick brown fox jumps over the lazy dog again and again today",
      3L -> "completely different words entirely unrelated content here now then")
    val pairs = Dedup.simhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("substring spans find exactly the copied paragraph, cross- and intra-doc") {
    // C1..C7 is a 7-token "paragraph" copied into both docs; with n=5
    // its pure-C anchors (3 of them, consecutive) are the only
    // duplicated 5-grams, so each doc reports ONE span of 7 tokens at
    // the paragraph's position. Boundary-straddling 5-grams mix unique
    // tokens and must not extend the span.
    val para = "C1 C2 C3 C4 C5 C6 C7"
    val d = docs(1L -> s"u1 u2 u3 $para u4 u5", 2L -> s"w1 w2 $para w3")
    val got = Dedup.substringSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 7L), (2L, 2L, 7L)))
    // intra-doc: the same phrase twice in ONE doc is signal too
    val intra = docs(9L -> s"$para x1 x2 x3 $para")
    val gi = Dedup.substringSpans(intra).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gi == Seq((9L, 0L, 7L), (9L, 10L, 7L)))
  }

  test("substring spans: minSpanTokens floor and anchor df cap both prune") {
    val para = "C1 C2 C3 C4 C5 C6 C7"
    val d = docs(1L -> s"u1 u2 u3 $para u4 u5", 2L -> s"w1 w2 $para w3",
      3L -> "z1 z2 D1 D2 D3 D4 D5 z3", 4L -> "y1 D1 D2 D3 D4 D5 y2 y3")
    // D-para is 5 tokens → span_tokens=5; a floor of 6 keeps only C spans
    val floored = Dedup.substringSpans(d, minSpanTokens = 6).collect()
    assert(floored.forall(_.getLong(2) >= 6) && floored.length == 2)
    // df cap at 1 drops every duplicated anchor (all have df=2) → empty
    assert(Dedup.substringSpans(d, maxAnchorDf = Some(1)).isEmpty)
  }

  test("native shingle hashes equal xxhash64 of the composed string shingles") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, TestSpark.sf)
    val composed = Dedup.shingleSets(d)
      .select(col("doc_id"), array_sort(transform(col("shingles"), s => xxhash64(s))).as("h"))
    val native = Dedup.shingleHashSets(d)
      .select(col("doc_id"), array_sort(col("shingles")).as("h"))
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("scalar SimHashExpr equals the explode + SimHashAgg formulation") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, TestSpark.sf)
    val viaAgg = d
      .select(col("doc_id"), explode(filter(split(col("text"), "\\s+"), t => t =!= lit(""))).as("t"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(xxhash64(col("t"))).as("simhash"))
    val viaScalar = Dedup.simhashSignatures(d)
    assert(viaAgg.exceptAll(viaScalar).isEmpty && viaScalar.exceptAll(viaAgg).isEmpty)
  }

  test("embedding pairs: cosine of identical vectors is 1.0") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(-3.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairs(e, threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("semantic dedup: subset of exhaustive pairs with identical scores, recall over floor") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val exact = Dedup.embeddingPairs(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sem = Dedup.semanticPairs(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "corpus should contain cosine >= 0.4 pairs")
    // precision 1.0 by construction: in-cell scoring is the exact cosine,
    // so a pair outside the exhaustive relation means a broken kernel
    assert(sem.subsetOf(exact), "semantic pair outside the exhaustive relation")
    // nprobe=4 of 8 cells measured recall 1.0 at every driver SF; the
    // floor leaves headroom for corpus drift, not for a broken join
    assert(sem.size.toDouble / exact.size >= 0.8,
      s"recall collapsed: ${sem.size}/${exact.size}")
  }

  test("semantic dedup nprobe is a real recall lever (soft assignment beats hard)") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val hard = Dedup.semanticPairs(e, nprobe = 1).count()
    val soft = Dedup.semanticPairs(e, nprobe = 4).count()
    assert(hard < soft,
      s"multi-probe found nothing beyond hard assignment on the boundary-heavy corpus: $hard vs $soft")
  }

  test("semantic containment verdict: planted exact-dup vectors are always found") {
    val row = Dedup.semanticCheck(graft.Tables.embeddings(spark, TestSpark.sf)).head()
    assert(row.getLong(0) > 0, "planting should create exact-dup pairs")
    assert(row.getLong(1) == 0L, s"missed planted pairs: $row")
    assert(row.getBoolean(2), s"containment broken: $row")
  }

  test("length-filter prune keeps a pair at exactly the threshold boundary") {
    // The r15 join-predicate length filter (jac ≤ min/max, so
    // min/max < t can't pass) must be EXACTLY consistent with the jac
    // filter at the boundary. This pair sits on it: n1=4, n2=5 shingles,
    // all 4 shared → jac = 4/(4+5-4) = 4/5 = 0.8 = the default
    // threshold, and min/max = 4/5 too. The division form keeps it
    // (round-to-nearest is monotone, both quotients land on the same
    // double as literal 0.8); the rejected t·n2 multiplication form
    // would compute 0.8·5 = 4.0000000000000002 > 4 and silently drop
    // this true pair — the regression this test exists to catch.
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f",     // 4 word-3-gram shingles
      2L -> "a b c d e f g"    // 5 shingles, sharing all 4
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(docs).collect()
    assert(pairs.length == 1 &&
      pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L,
      s"boundary pair (jac exactly 0.8) must survive the length filter: ${pairs.toSeq}")
    assert(math.abs(pairs.head.getDouble(2) - 0.8) < 1e-12)
    // and a pair just UNDER the size bound is pruned: n1=3, n2=5 →
    // min/max = 0.6 < 0.8, jac ≤ 0.6 regardless of overlap
    val docs2 = Seq(1L -> "a b c d e", 2L -> "a b c d e f g").toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(docs2).collect().isEmpty)
  }

  test("semantic containment verdict is falsifiable: impossible threshold reports misses") {
    // cosine never exceeds 1.0, so every planted pair must be missed and
    // the verdict must be able to say so (guards against a vacuous check)
    val row = Dedup.semanticCheck(graft.Tables.embeddings(spark, TestSpark.sf),
      threshold = 1.1).head()
    assert(row.getLong(1) > 0 && !row.getBoolean(2), s"verdict cannot fail: $row")
  }
}
