package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract on the driver-generated testdata (VERDICT r8 #2): the
  * ts-vintage drift class has now bitten twice — INT64 nanos-as-long in
  * early rounds, pyarrow timestamp[us]-without-UTC-flag (TIMESTAMP_NTZ
  * under Spark's default inference) in round 8, where it killed 8 queries,
  * 12 tests and the driver bench at once. These gates make the NEXT
  * regeneration fail in seconds with the type name in the message, instead
  * of mid-bench with `EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deleteDir(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** Stage the sf0.001 events table as a single NTZ-vintage
    * `events.parquet` FILE under `dir` (the testdata layout the loaders
    * and the stream harness expect), exactly what the round-8 driver
    * regeneration produced: timestamp[us] with no UTC flag.
    */
  private def stageNtzEvents(dir: java.nio.file.Path): Unit = {
    val stage = s"$dir/stage"
    Tables.events(spark, TestSpark.sf)
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dir.resolve("events.parquet"))
    deleteDir(java.nio.file.Paths.get(stage))
  }

  test("Tables.events yields TimestampType ts for every sf dir") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      if (new java.io.File(s"$d/events.parquet").exists) {
        val t = Tables.events(spark, d).schema("ts").dataType
        assert(t == TimestampType, s"$sf: events.ts normalized to $t, not TimestampType")
      }
    }
  }

  test("Tables.events normalizes an NTZ-vintage read to the same instants") {
    // Emulate a library caller's stock session — Spark's default
    // inference ON (graft's builder-level false is inherited by
    // newSession, so flip it back explicitly).
    val ntzDir = java.nio.file.Files.createTempDirectory("graft_ntz_events")
    try {
      stageNtzEvents(ntzDir)
      val ntzSession = spark.newSession()
      ntzSession.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // the staged file really is NTZ under inference…
      val rawT = ntzSession.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType
      assert(rawT == TimestampNTZType, s"staged vintage read back as $rawT — test setup broken")
      // …and the loader still hands every consumer TimestampType, with
      // instants identical to the config-layer read (UTC identity cast)
      val viaNtz = Tables.events(ntzSession, ntzDir.toString)
      assert(viaNtz.schema("ts").dataType == TimestampType)
      val viaConf = Tables.events(spark, ntzDir.toString)
      assert(viaConf.schema("ts").dataType == TimestampType)
      val a = viaNtz.select(unix_micros(col("ts"))).orderBy(col("user_id"), col("ts")).collect().toSeq
      val b = viaConf.select(unix_micros(col("ts"))).orderBy(col("user_id"), col("ts")).collect().toSeq
      assert(a == b, "NTZ-normalized instants differ from the config-layer read")
    } finally deleteDir(ntzDir)
  }

  test("NTZ normalization yields the same instants on a NON-UTC session") {
    // The NTZ arm exists for library callers on their own sessions,
    // which are not timezone-pinned: a bare NTZ→Timestamp cast would
    // interpret the UTC wall-clock in the caller's zone and silently
    // shift every instant (5h for America/New_York). The loader must
    // yield the same epoch micros on any session timezone.
    val ntzDir = java.nio.file.Files.createTempDirectory("graft_ntz_tz")
    try {
      stageNtzEvents(ntzDir)
      val canonical = Tables.events(spark, ntzDir.toString)
        .select(unix_micros(col("ts"))).orderBy(col("user_id"), col("ts")).collect().toSeq
      val nySession = spark.newSession()
      nySession.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      nySession.conf.set("spark.sql.session.timeZone", "America/New_York")
      val viaNy = Tables.events(nySession, ntzDir.toString)
        .select(unix_micros(col("ts"))).orderBy(col("user_id"), col("ts")).collect().toSeq
      assert(viaNy == canonical,
        "NTZ read on a non-UTC session shifted instants — the UTC pin is broken")
    } finally deleteDir(ntzDir)
  }

  test("NTZ walls inside the session zone's DST gap/overlap keep their UTC instant") {
    // ADVICE r9: the old cast-then-from_utc_timestamp round-trip applied
    // America/New_York's offset twice at potentially different rules — a
    // UTC wall landing in NY's spring-forward gap (02:30 on 2024-03-10
    // does not exist as a NY local time) came back shifted by 1h, and a
    // wall in the fall-back overlap (01:30 on 2024-11-03 exists twice)
    // was ambiguous. The data contract says the wall IS UTC, so both
    // instants are unambiguous; the offset-suffix parse must return them
    // exactly on a NY session.
    val walls = Seq("2024-03-10T02:30:00", "2024-11-03T01:30:00", "2024-06-01T12:00:00")
    val nySession = spark.newSession()
    nySession.conf.set("spark.sql.session.timeZone", "America/New_York")
    val ntz = {
      import nySession.implicits._
      walls.toDF("s").select(col("s").cast(TimestampNTZType).as("ts"))
    }
    val got = Events.withTs(ntz).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    val want = walls.map(w => java.time.LocalDateTime.parse(w)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
    assert(got == want,
      s"DST-gap/overlap walls shifted on a non-UTC session: got $got, want $want")
  }

  test("windowAgg finalizes identical windows from an NTZ-staged events file") {
    // VERDICT r8 #4: the bounded-stream harness must tolerate either
    // parquet vintage. Stage a deliberately-NTZ events.parquet and prove
    // the watermarked windowed aggregation still analyzes, runs and
    // finalizes the SAME windows as the canonical staged file.
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_stage")
    try {
      stageNtzEvents(dir)
      val fromNtz = Events.windowAgg(spark, dir.toString)
      val fromCanonical = Events.windowAgg(spark, TestSpark.sf)
      assert(fromNtz.collect().toSeq == fromCanonical.collect().toSeq)
    } finally deleteDir(dir)
  }

  test("withTs and farFutureTs handle the NTZ read-back types directly") {
    // Unreachable through runBounded while the session config pins
    // TimestampType reads — but a caller on a stock session hits both.
    import spark.implicits._
    val ntz = Seq("2024-01-01T00:00:00").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(Events.withTs(ntz).schema("ts").dataType == TimestampType)
    val ldt = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val bumped = spark.range(1).select(Events.farFutureTs(ldt, 2).as("ts"))
    assert(bumped.schema("ts").dataType == TimestampNTZType) // stays in raw's own type
    assert(bumped.head().getAs[java.time.LocalDateTime]("ts") == ldt.plusDays(2))
  }
}
