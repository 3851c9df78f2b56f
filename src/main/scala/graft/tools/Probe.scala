package graft.tools
import graft._
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.length != 1 || !SparkEntry.queries.contains(args(0))) {
      System.err.println("usage: graft.tools.Probe <query>\navailable: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = GraftSession.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    // time construction + execution together: queries with an eager
    // localCheckpoint (q_rank_suppliers, pack_sequences) do real work
    // while BUILDING the frame, and timing only the write would hide it
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, d)
    df.write.format("noop").mode("overwrite").save()
    println(f"TIMED $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    df.explain("formatted")
    spark.stop()
  }
}
