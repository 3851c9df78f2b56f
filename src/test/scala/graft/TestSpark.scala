package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (suites run
  * sequentially; Spark startup is ~8s, paying it once keeps `sbt test`
  * fast).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("4")
  val sf: String = "/root/testdata/sf0.001"
}
