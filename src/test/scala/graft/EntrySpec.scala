package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract gates on the `SparkEntry` surface itself (VERDICT r7 #3/#4):
  * every registered query must at least ANALYZE, and the registry must
  * stay in lockstep with SURVEY.md §2 — the inventory the driver and
  * judge grade against. Both failure modes shipped in round 7
  * (`corpus_upsample`: analysis-time AnalysisException that poisoned a
  * 399-second bench; two operators in code with no §2 row), and both
  * would have been seconds-cheap to catch here.
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registered query analyzes against the test tables") {
    // Queries that EXECUTE during construction are excluded — running
    // them here would re-pay their own suites, not add a cheap gate:
    // streaming queries and sdfs_roundtrip return local relations, and
    // incremental_clean / snapshot_apply eagerly materialize their
    // prior-state/delta checkpoints (SnapshotSpec runs both fully, so an
    // analysis error in them still fails sbt test). Everything else is
    // lazy or a bounded verdict, so touching `analyzed` stays cheap.
    val skip = (n: String) => n.startsWith("stream_") ||
      Set("sdfs_roundtrip", "incremental_clean", "snapshot_apply")(n)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, q) if !skip(name) =>
        try { q(spark, TestSpark.sf).queryExecution.analyzed; None }
        catch { case e: Exception => Some(s"$name: ${e.getClass.getSimpleName} " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")) }
    }.flatten
    assert(failures.isEmpty, s"queries failing analysis:\n${failures.mkString("\n")}")
  }

  test("SparkEntry.queries matches the SURVEY §2 inventory exactly") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val section2 = survey.split("\n## ").find(_.startsWith("§2")).getOrElse(
      fail("SURVEY.md has no §2 section"))
    // inventory rows: | `name` | kind | ... — kind containing "query"
    // promises a SparkEntry.queries entry (§2 preamble); `lib` rows are
    // spec-only API
    val row = """\|\s*`([a-z0-9_]+)`\s*\|\s*([a-z/]+)\s*\|""".r
    val surveyQueries = row.findAllMatchIn(section2)
      .collect { case m if m.group(2).contains("query") => m.group(1) }.toSet
    val registered = SparkEntry.queries.keySet
    val unregistered = surveyQueries -- registered
    val undocumented = registered -- surveyQueries
    assert(unregistered.isEmpty && undocumented.isEmpty,
      s"SURVEY §2 drift — rows with no queries entry: ${unregistered.toSeq.sorted.mkString(", ")}; " +
        s"queries with no §2 row: ${undocumented.toSeq.sorted.mkString(", ")}")
    // every oracle belongs to a registered query (a typo'd oracle key
    // would silently downgrade its query to rows-only)
    val orphanOracles = SparkEntry.oracleSql.keySet -- registered
    assert(orphanOracles.isEmpty,
      s"oracleSql keys with no matching query: ${orphanOracles.toSeq.sorted.mkString(", ")}")
    // and the oracle COLUMN tells the truth both ways: a row whose
    // oracle cell starts with "SQL" has an oracleSql entry, and every
    // oracle-backed query row says so (r8 probe found three rows
    // under-claiming "rows-only"/"spec" for oracle-checked queries)
    val rowFull = """(?m)^\|\s*`([a-z0-9_]+)`\s*\|\s*([a-z/]+)\s*\|.*\|\s*([^|]+)\|\s*$""".r
    val claims = rowFull.findAllMatchIn(section2)
      .collect { case m if m.group(2).contains("query") =>
        m.group(1) -> m.group(3).trim.startsWith("SQL") }.toMap
    val misclaimed = claims.collect {
      case (n, claimsSql) if claimsSql != SparkEntry.oracleSql.contains(n) =>
        s"$n (cell says ${if (claimsSql) "SQL" else "no oracle"}, " +
          s"oracleSql ${if (SparkEntry.oracleSql.contains(n)) "has" else "lacks"} it)"
    }
    assert(misclaimed.isEmpty,
      s"SURVEY oracle-column drift: ${misclaimed.toSeq.sorted.mkString("; ")}")
  }
}
