package graft

import graft.operators.{Dedup, Training}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null/degenerate-input behavior of the text pipeline. A 100 TB crawl
  * always carries null and empty text rows; every operator must have a
  * DEFINED reaction (propagate null or drop the row), never a crash.
  * The native expressions are UnaryExpressions with nullSafeEval, so
  * null text → null output → explode/filter drops the row; these specs
  * pin that chain end-to-end per operator family.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftSession.registerFunctions(s); s }

  private def docsWithNull = {
    import spark.implicits._
    Seq((1L, Option("the cat sat on the mat")), (2L, None), (3L, Option("")),
      (4L, Option("   ")))
      .toDF("doc_id", "text")
  }

  test("native text expressions propagate null and handle empty/blank text") {
    val out = docsWithNull.select(col("doc_id"),
      graft.functions.TokenStats.tokenStats(col("text")).as("ts"),
      graft.functions.RepetitionStats.repetitionStats(col("text")).as("rs"),
      graft.functions.ShingleFunctions.shingleHashes(col("text"), 3).as("sh"),
      graft.functions.ShingleFunctions.shingleHashSeq(col("text"), 3).as("shs"),
      graft.functions.ShingleFunctions.simhash(col("text")).as("sim"))
      .orderBy(col("doc_id")).collect()
    assert(out.length == 4)
    // null text → every derived column null (simhash included)
    assert((1 to 5).forall(i => out(1).isNullAt(i)))
    // empty + whitespace-only text → zero counts, empty arrays, not nulls
    for (r <- Seq(out(2), out(3))) {
      assert(r.getStruct(1).getLong(0) == 0L && r.getStruct(2).getLong(0) == 0L)
      assert(r.getSeq[Long](3).isEmpty && r.getSeq[Long](4).isEmpty)
      assert(!r.isNullAt(5))
    }
  }

  test("dedup and decontam pipelines drop null/empty docs instead of crashing") {
    // shingle-based ops: null/short docs have no 3-gram → silently absent
    assert(Dedup.ngramJaccard(docsWithNull).count() == 0)
    assert(Dedup.substringSpans(docsWithNull, 3).count() == 0)
    assert(Training.decontamBloom(docsWithNull).count() == 0)
    // exact dedup groups by md5(text): null text is its own group — it
    // must survive (a crawl's null rows still need exactly-one-kept)
    assert(Dedup.exact(docsWithNull).count() == 4)
  }
}
