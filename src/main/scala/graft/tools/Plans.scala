package graft.tools
import graft._

/** Dump `.explain("formatted")` for declared queries into a directory —
  * the optimization rounds' plan-evidence capture (guide §1: record the
  * plan shape — Exchange count, join strategy, PushedFilters/ReadSchema —
  * before and after each change). Usage:
  *
  *   runMain graft.tools.Plans <outDir> <suffix> [query...]
  *
  * Writes `<outDir>/<query>_<suffix>.txt` per query. With no query names,
  * dumps every declared query whose plan is meaningful as a single frame
  * (the staged streaming loops run a driver program over many jobs; their
  * returned frame is a detached scratch-parquet scan, so dumping it would
  * record the harness, not the computation — they are skipped unless
  * named explicitly). Plans are captured WITHOUT executing the query
  * (explain only), so this tool is cheap enough to run on the full
  * surface; note AQE plans print `isFinalPlan=false` here.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.Plans <outDir> <suffix> [query...]")
      sys.exit(2)
    }
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("stream_"))
    val unknown = names.toSet -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var failures = 0
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, d)
        // queryExecution.explainString is explain("formatted") without
        // the stdout detour — capturable as a string
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"wrote ${name}_$suffix.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        failures += 1
        System.err.println(s"$name FAILED: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(300))
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
