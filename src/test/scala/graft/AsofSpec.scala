package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the union-tag as-of join (q_asof_join): the
  * DuckDB oracle pins the bulk behavior on the real events table; these
  * pin the boundary rules on a hand-built stream.
  */
class AsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of matches the latest click at-or-before each purchase, NULL when none") {
    import spark.implicits._
    val us = 1000000L // micros per second
    val ev = Seq(
      // user 1: click@10, click@20, purchase@20 (equal ts → inclusive),
      // purchase@25 (→ click@20), click@30 after everything
      (1L, 1L, 10 * us, "click", 0.1),
      (2L, 1L, 20 * us, "click", 0.2),
      (3L, 1L, 20 * us, "purchase", 9.0),
      (4L, 1L, 25 * us, "purchase", 8.0),
      (5L, 1L, 30 * us, "click", 0.3),
      // user 2: purchase with NO prior click
      (6L, 2L, 15 * us, "purchase", 7.0),
      (7L, 2L, 16 * us, "click", 0.4),
      // user 3: other event types never match
      (8L, 3L, 5 * us, "view", 0.5),
      (9L, 3L, 6 * us, "purchase", 6.0))
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val dir = java.nio.file.Files.createTempDirectory("graft_asof")
    try {
      // route through a parquet table so the query's Tables.events loader
      // sees the same shape the driver provides
      ev.write.parquet(s"$dir/events.parquet")
      val out = graft.operators.Relational.qAsofJoin(spark, dir.toString)
        .collect().map(r => (r.getLong(0),
          Option(r.getTimestamp(3)).map(_.getTime / 1000), r.get(4))).toSeq
      assert(out == Seq(
        (3L, Some(20L), 0.2), // equal ts: click at 20 matches inclusively
        (4L, Some(20L), 0.2), // latest at-or-before, not the later click@30
        (6L, None, null), // no prior click → left-join NULLs
        (9L, None, null))) // a view is not a click
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }
}
