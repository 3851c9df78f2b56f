package graft

/** Process-wide collector for the stage-lap marks the streaming ingest
  * loops (and the batch incremental pipeline) emit through
  * [[graft.operators.Snapshot.incrLap]]. [[Bench]] installs it around
  * each timed query so the bench record can carry a per-stage `laps`
  * map — the split `tools/bench_compare.py` uses to attribute a
  * loop-query mover to "the staged harness work grew" vs "the loop got
  * slower" mechanically (VERDICT r13 #4; each of rounds 11-13 needed a
  * hand-run idle re-measure for that adjudication).
  *
  * Inactive outside a begin/end window: `record` is a volatile read and
  * nothing else, so production loop code pays nothing. The buffer is a
  * concurrent queue because foreachBatch laps land from the stream
  * execution thread while the driver thread stages arrivals.
  */
object Laps {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
  @volatile private var active = false

  /** Start collecting (clears anything a previous window left). */
  def begin(): Unit = { buf.clear(); active = true }

  /** Stop collecting and drain the recorded `(stage, seconds)` marks in
    * arrival order. */
  def end(): Seq[(String, Double)] = {
    active = false
    val out = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toList
  }

  private[graft] def record(stage: String, secs: Double): Unit =
    if (active) buf.add((stage, secs))
}
