package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head.get(0).asInstanceOf[T]
  }

  test("tokens splits on whitespace and drops empties") {
    assert(one[scala.collection.Seq[String]](tokens(col("text")), "  a  b\tc \n d ").toList ==
      List("a", "b", "c", "d"))
  }

  test("punctCount counts non-alnum non-space bytes") {
    assert(one[Int](punctCount(col("text")), "a.b,c!") == 3)
    assert(one[Int](punctCount(col("text")), "abc 123") == 0)
  }

  test("bpeTokenCount: letter runs, digit runs, single punct") {
    // "ab12cd!?" -> ab | 12 | cd | ! | ?  = 5
    assert(one[Long](bpeTokenCount(col("text")), "ab12cd!?") == 5L)
  }

  test("rollingFingerprint matches hand-computed polynomial hash") {
    // fp("ab") = (0*31+97)*31 + 98 = 3105
    assert(one[Long](rollingFingerprint(col("text")), "ab") == (97L * 31 + 98))
    // deterministic: same input -> same fp
    assert(one[Long](rollingFingerprint(col("text")), "spark") ==
      one[Long](rollingFingerprint(col("text")), "spark"))
  }

  test("stopwordRatio on a known sentence") {
    val r = one[Double](stopwordRatio(tokens(col("text")), stopEn), "the cat sat")
    assert(math.abs(r - 1.0 / 3.0) < 1e-9)
  }
}
