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

  test("corpus-wide tokenize equals per-word applyMerges, word for word") {
    import spark.implicits._
    val merges = Bpe.train(corpus, numMerges = 5)
    val docs = Seq((1L, "low lower newest"), (2L, "widest low"), (3L, ""),
      (4L, "  lowest  ")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2))).toList
    def ref(text: String): Seq[String] =
      text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(w => Bpe.applyMerges(w, merges))
    for ((id, toks, n) <- got) {
      val expect = ref(Seq("low lower newest", "widest low", "", "  lowest  ")(id.toInt - 1))
      assert(toks == expect, s"doc $id")
      assert(n == expect.length.toLong)
    }
    // and the tokens reconstruct the text: strip </w>, join words
    val doc1 = got.head._2.mkString.split("</w>").filter(_.nonEmpty).mkString(" ")
    assert(doc1 == "low lower newest")
  }

  test("batched training is exact: merge table identical to one-merge-per-round") {
    import spark.implicits._
    // chain-heavy corpus (Sennrich): ties force mostly-serial rounds
    // ((e,s)/(s,t) tie at 9, (l,o)/(o,w) tie at 7), but (est,</w>)=9 +
    // (l,o)=7 batch together — (est,</w>)'s conflicts all count ≤6, so
    // no created pair can reach 7. The TABLE must equal m=1 exactly.
    val rounds = scala.collection.mutable.ListBuffer.empty[Int]
    val batched = Bpe.train(corpus, numMerges = 5, batchSize = 8, Some(rounds))
    assert(batched == Bpe.train(corpus, numMerges = 5))
    assert(rounds.sum == 5 && rounds.length < 5,
      s"batching should shave at least one round while staying exact: $rounds")
    // flat corpus: (a,b)=9 across two contexts outranks its neighbors
    // (b,q)=5/(b,r)=4, and (c,d)=7 > 5 clears the chain guard — so
    // round 0 legitimately learns BOTH; m=1 must agree on the table
    val flat = (Seq.fill(5)("abq") ++ Seq.fill(4)("abr") ++
      Seq.fill(4)("cds") ++ Seq.fill(3)("cdt"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val rounds2 = scala.collection.mutable.ListBuffer.empty[Int]
    val batched2 = Bpe.train(flat, numMerges = 2, batchSize = 8, Some(rounds2))
    assert(batched2 == Bpe.train(flat, numMerges = 2))
    assert(batched2.map(m => (m.left, m.right, m.freq)) ==
      Seq(("a", "b", 9L), ("c", "d", 7L)))
    assert(rounds2.toList == List(2), s"flat corpus should batch both merges: $rounds2")
    // adversarial tie: 'azy'x9 + 'az'x1 + 'bd'x9 — round 0 has (a,z)=10
    // and a 9-tie where the conflict (z,y) sorts AFTER the disjoint
    // candidate (b,d), while merging (a,z) creates (az,y)=9 whose left
    // 'az' wins the lexicographic tie against 'b'. A prefix-scan guard
    // batches (b,d) and diverges from serial, which learns (az,y) at
    // rank 1; the whole-fetch threat bound must serialize this round.
    val adversarial = (Seq.fill(9)("azy") ++ Seq("az") ++ Seq.fill(9)("bd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val batched3 = Bpe.train(adversarial, numMerges = 3, batchSize = 8)
    assert(batched3 == Bpe.train(adversarial, numMerges = 3))
    assert(batched3.take(2).map(m => (m.left, m.right)) == Seq(("a", "z"), ("az", "y")))
    // result-collision path: '</w>' assembled from corpus characters
    // collides with the word marker partway through the chain — the
    // batch must close at the collision and stay serial-equivalent
    // (both paths share the replace mechanics, so equality is the
    // meaningful assertion even in this degenerate corpus)
    val marker = (Seq.fill(10)("</w>") ++ Seq.fill(3)("ok"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    assert(Bpe.train(marker, numMerges = 6, batchSize = 8) ==
      Bpe.train(marker, numMerges = 6))
  }

  test("pack_sequences_bpe: offsets are the running sum of BPE token counts") {
    import spark.implicits._
    val docs = (Seq.fill(3)("low low lower") ++ Seq.fill(3)("newest widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val packed = graft.operators.Training.packSequencesBpe(docs, numMerges = 5, seqLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // recompute the reference on the driver from the same merge table
    val merges = Bpe.train(docs, numMerges = 5, batchSize = 8)
    val counts = docs.orderBy("doc_id").collect().map { r =>
      (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Bpe.applyMerges(w, merges)).length.toLong)
    }
    var off = 0L
    val expect = counts.map { case (id, n) =>
      val row = (id, n, off, off / 4); off += n; row
    }.toSeq
    assert(packed.toSeq == expect)
  }

  test("native tokenize == replace-chain tokenize == applyMerges (three-way witness)") {
    import spark.implicits._
    val merges = Bpe.train(corpus, numMerges = 5)
    val docs = Seq((1L, "low lower newest"), (2L, "widest low lowest"), (3L, ""),
      (4L, "  low   low  ")).toDF("doc_id", "text")
    def dump(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2))).toList
    val native = dump(Bpe.tokenize(docs, merges))
    val chain = dump(Bpe.tokenizeChain(docs, merges))
    assert(native == chain, "native encoder diverged from the replace chain")
    // plan shape over a PARQUET source (a local relation constant-folds
    // to LocalTableScan): the native path is ONE expression, not a
    // |merges|-deep replace chain, and no Scala UDF snuck in
    val pdocs = Tables.documents(spark, TestSpark.sf)
    val plan = Bpe.tokenize(pdocs, merges).queryExecution.executedPlan.toString
    assert(plan.contains("graft_bpe_encode"), s"tokenize lost the native encoder:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"tokenize regressed to a Scala UDF:\n$plan")
    assert(!plan.contains("replace("), s"tokenize still carries the replace chain:\n$plan")
    // the |merges|-independence claim (VERDICT r6 #3), structurally: a
    // table 40x larger must not grow the plan at all
    val big = merges ++ (5 until 200).map(r => Bpe.Merge(r, s"x$r", s"y$r", 1L))
    val bigPlan = Bpe.tokenize(pdocs, big).queryExecution.executedPlan.toString
    assert(bigPlan.length == plan.length,
      s"plan size scales with |merges|: ${plan.length} -> ${bigPlan.length}")
  }

  test("codec applies 1k+-merge random tables word-for-word like applyMerges") {
    // compositional random tables over a SMALL alphabet: results re-enter
    // the symbol pool, so tables contain chained merges, duplicate
    // (left,right) pairs at distinct ranks (the multi-rank path), and
    // merges that mention the word marker — every shape a trained table
    // can produce, at a size (1.2k) no replace chain could codegen
    val rnd = new scala.util.Random(20260813L)
    val alphabet = ('a' to 'f').map(_.toString)
    for (trial <- 0 until 3) {
      val pool = scala.collection.mutable.ArrayBuffer[String](alphabet: _*) += "</w>"
      val merges = (0 until 1200).map { r =>
        val l = pool(rnd.nextInt(pool.size)); val rt = pool(rnd.nextInt(pool.size))
        pool += (l + rt)
        Bpe.Merge(r, l, rt, 1L)
      }
      assert(merges.groupBy(m => (m.left, m.right)).exists(_._2.size > 1) || trial > 0,
        "random tables should exercise duplicate-pair ranks at least once")
      val codec = graft.functions.BpeCodec(merges)
      val words = (0 until 200).map(_ =>
        (0 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString) ++
        Seq("aaaaaaa", "abcdef", "fedcba", "😀ab") // runs, sweeps, a surrogate pair
      // comparison happens in SPARK's string space: tokens live as
      // UTF8Strings there, and UTF-8 cannot carry the lone surrogate
      // halves split("") makes of an emoji — the old replace-chain path
      // mangled them identically, so the reference normalizes through
      // the same round trip
      def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s).toString
      for (w <- words)
        assert(codec.encodeWord(w).map(_.toString).toSeq ==
          Bpe.applyMerges(w, merges).map(u8),
          s"trial $trial word '${u8(w)}'")
      // doc-level concatenation + whitespace handling, off the cache path
      val text = words.take(40).mkString(" ") + "  " + words.take(3).mkString("\t")
      val expect = text.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => Bpe.applyMerges(w, merges))
      val got = codec.encode(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == expect, s"trial $trial doc-level encode")
    }
  }

  test("Spark-path tokenize carries a 5k-merge table (production vocabulary scale)") {
    // the whole point of the native encoder: a table size the replace
    // chain could never codegen, applied corpus-wide through the
    // broadcast + expression path (not just the codec unit path), and
    // still word-for-word identical to the driver reference
    val rnd = new scala.util.Random(7L)
    val alphabet = ('a' to 'z').map(_.toString)
    val pool = scala.collection.mutable.ArrayBuffer[String](alphabet: _*) += "</w>"
    val merges = (0 until 5000).map { r =>
      val l = pool(rnd.nextInt(pool.size)); val rt = pool(rnd.nextInt(pool.size))
      pool += (l + rt)
      Bpe.Merge(r, l, rt, 1L)
    }
    val docs = Tables.documents(spark, TestSpark.sf)
    val got = Bpe.tokenize(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    val memo = scala.collection.mutable.Map.empty[String, Seq[String]]
    val expect = docs.select("doc_id", "text").orderBy("doc_id").collect().map { r =>
      (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty).toList
        .flatMap(w => memo.getOrElseUpdate(w, Bpe.applyMerges(w, merges))))
    }
    assert(got.length == expect.length && got.length > 0)
    for (((gid, gt), (eid, et)) <- got.zip(expect)) {
      assert(gid == eid)
      assert(gt == et, s"doc $gid diverged at 5k merges")
    }
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
