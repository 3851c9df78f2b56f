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
  // DISTINCT colliding labels warn once each per window (ADVICE r17: a
  // single boolean deduped per-iteration spam of one label but silently
  // swallowed a second, different colliding label). Bounded: capped at
  // MaxWarnedLabels distinct entries — past that, collisions are still
  // escaped, just no longer individually announced.
  private val warnedLabels =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val MaxWarnedLabels = 64

  /** Label prefix for marks that are INTERNAL DETAIL of an enclosing
    * stage (the incremental pipeline's "manifest diff" / "closure
    * round N" inside a loop's drain): bench_compare.py's
    * staging/loop/readback split excludes them structurally — summing
    * them would double-count the drain they are already part of
    * (ADVICE r14: the old exclusion relied on detail labels happening
    * not to start with a classified prefix). */
  val DetailPrefix = "detail: "

  /** Start collecting (clears anything a previous window left).
    * SINGLE-OWNER contract (ADVICE r14): windows must not nest or
    * overlap — the collector is process-global, so a second begin()
    * from a concurrent owner discards the active window's marks.
    * Safe today because Test/fork runs suites sequentially and
    * Bench/Soak are single-driver loops; loud (stderr, not a throw —
    * a profiling guard must not kill a bench) if that ever changes.
    * A begin() after a FAILED query that never reached end() is the
    * legitimate same-owner reuse (LapsSpec pins the discard). */
  def begin(): Unit = {
    if (active)
      System.err.println("[laps] WARNING: begin() while a window is " +
        "active — the previous window's marks are discarded " +
        "(single-owner contract; see Laps.begin doc)")
    buf.clear(); warnedLabels.clear(); active = true
  }

  /** Stop collecting and drain the recorded `(stage, seconds)` marks in
    * arrival order. */
  def end(): Seq[(String, Double)] = {
    active = false
    val out = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toList
  }

  /** The key [[Bench]]'s per-pass lap objects reserve for the pass
    * wall-clock (`laps_passes`); a lap literally labeled this would
    * silently overwrite the pass total and corrupt bench_compare's
    * exact per-pass residual (ADVICE r15). */
  val ReservedTotalKey = "_total"

  /** Escape prefix for labels that would collide with the reserved
    * key. Applied to the reserved key itself AND to any label already
    * carrying the prefix (recursively injective): a caller lap
    * literally named "escaped: _total" becomes "escaped: escaped:
    * _total" instead of silently merging with the escaped reserved key
    * (ADVICE r16). */
  private val EscapePrefix = "escaped: "

  private[graft] def record(stage: String, secs: Double): Unit =
    if (active) {
      // Escape rather than throw — a profiling guard must not kill a
      // bench (same philosophy as begin()'s warn) — but loudly (once
      // per window PER DISTINCT LABEL: the dedup exists to stop a
      // per-epoch loop spamming one label's warning every iteration,
      // not to hide a second, different colliding label — ADVICE r16
      // then r17), and under a name no caller label can collide with.
      val s =
        if (stage == ReservedTotalKey || stage.startsWith(EscapePrefix)) {
          if (warnedLabels.size < MaxWarnedLabels && warnedLabels.add(stage))
            System.err.println(s"[laps] WARNING: lap label \"$stage\" collides with " +
              s"the reserved per-pass total key or its escape prefix — recorded " +
              s"as \"$EscapePrefix$stage\"")
          EscapePrefix + stage
        } else stage
      buf.add((s, secs))
    }
}
