package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec for §2.7: the streaming results must equal the same computation
  * done in batch over the full events table (stream/batch unification —
  * the property Structured Streaming guarantees when watermarks are
  * honored and state is flushed).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream_window_agg equals the batch tumbling-window aggregation") {
    val streamed = Events.windowAgg(spark, TestSpark.sf)
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("file-sink append path finalizes the same windows as the memory-sink harness") {
    val fromFiles = Events.windowAggToFiles(spark, TestSpark.sf)
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
    assert(fromFiles.collect().toSeq == batch.collect().toSeq)
  }

  test("sliding windows put every event in exactly 4 overlapping windows") {
    val streamed = Events.slidingWindowAgg(spark, TestSpark.sf)
    val nEvents = Tables.events(spark, TestSpark.sf).count()
    assert(streamed.agg(sum(col("n_events"))).head().getLong(0) == 4 * nEvents)
    // batch equivalence: explode each event to its 4 slide marks
    val batch = Tables.events(spark, TestSpark.sf)
      .select(col("ts"), col("event_type"), col("value"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .select((timestamp_seconds(floor(unix_micros(col("ts")) / 1e6 / 900) * 900
          - col("k") * 900)).as("window_start"),
        col("event_type"), col("value"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_dedup drops a replayed micro-batch, emitting each event exactly once") {
    val deduped = Events.dedupEvents(spark, TestSpark.sf)
    val original = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
    // the harness redelivers every 10th event; without dedup the sink
    // would hold 1.1x the source — equality pins exactly-once
    assert(deduped.collect().toSeq == original.collect().toSeq)
  }

  test("stream-static enrichment equals the batch lookup join") {
    val streamed = Events.enrich(spark, TestSpark.sf)
    val batch = Tables.events(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream-stream band join converges to the batch range join") {
    val streamed = Events.streamStreamJoin(spark, TestSpark.sf)
    val batch = graft.operators.Relational.qRangeJoin(spark, TestSpark.sf)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("built-in session_window agrees island-for-island with the custom sessionizer") {
    // the two formulations differ ONLY at an exactly-30-minute gap
    // (session_window splits, the gaps-and-islands rule merges) — check
    // the corpus really has none before relying on their agreement
    import org.apache.spark.sql.expressions.Window
    val exactGaps = Tables.events(spark, TestSpark.sf)
      .withColumn("gap_us", unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts")))))
      .filter(col("gap_us") === 30L * 60 * 1000 * 1000).count()
    assert(exactGaps == 0, "corpus grew an exact-gap pair — boundary semantics now diverge")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value")).collect().toSeq
    val builtin = rows(Events.sessionWindowAgg(spark, TestSpark.sf))
    val custom = rows(Events.sessionize(spark, TestSpark.sf))
    assert(builtin.size == custom.size)
    // keys exactly; total_value within epsilon — the two paths sum
    // doubles in different orders, so a .xx5-boundary session could
    // round differently while being semantically identical
    builtin.zip(custom).foreach { case (b, c) =>
      assert((b.getLong(0), b.getTimestamp(1), b.getTimestamp(2), b.getLong(3)) ==
        (c.getLong(0), c.getTimestamp(1), c.getTimestamp(2), c.getLong(3)), s"$b != $c")
      assert(math.abs(b.getDouble(4) - c.getDouble(4)) <= 0.011, s"$b != $c")
    }
  }

  test("stream_sessionize equals the batch gaps-and-islands sessionization") {
    val streamed = Events.sessionize(spark, TestSpark.sf)
    Tables.events(spark, TestSpark.sf).createOrReplaceTempView("ev_batch")
    val batch = spark.sql(
      """WITH m AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_s
        | FROM ev_batch WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts) AS session_start,
        | max(ts) AS session_end, count(*) AS n_events,
        | round(sum(value), 2) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
