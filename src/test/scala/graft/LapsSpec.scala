package graft

import org.scalatest.funsuite.AnyFunSuite

/** The process-wide stage-lap collector Bench wraps around each timed
  * query. The contract the bench split depends on: records land ONLY
  * inside a begin/end window (production loop code pays a volatile
  * read otherwise), end() drains in arrival order without collapsing
  * repeated stages (a crash-replayed drain records its stage twice and
  * the summed pass total is the honest cost), and begin() discards
  * whatever a previous window left behind.
  */
class LapsSpec extends AnyFunSuite {

  test("records only inside a begin/end window, in arrival order") {
    Laps.record("before window", 1.0) // dropped: inactive
    Laps.begin()
    Laps.record("stage a", 0.5)
    Laps.record("stage b", 0.25)
    Laps.record("stage a", 0.125) // repeat preserved, not merged
    val got = Laps.end()
    assert(got == Seq(("stage a", 0.5), ("stage b", 0.25), ("stage a", 0.125)))
    Laps.record("after window", 1.0) // dropped: window closed
    Laps.begin()
    assert(Laps.end().isEmpty, "a new window must start empty")
  }

  test("a lap literally labeled \"_total\" is escaped, not recorded verbatim") {
    // "_total" is the reserved per-pass wall-clock key in Bench's
    // laps_passes objects; a verbatim record would overwrite the pass
    // total and corrupt bench_compare's exact residual (ADVICE r15).
    Laps.begin()
    Laps.record(Laps.ReservedTotalKey, 2.0)
    Laps.record("stage a", 1.0)
    val got = Laps.end()
    assert(got == Seq(("escaped: _total", 2.0), ("stage a", 1.0)))
    assert(!got.exists(_._1 == Laps.ReservedTotalKey))
  }

  test("the escape is injective: a label already carrying the prefix cannot merge with the escaped reserved key") {
    // ADVICE r16: a caller lap literally named "escaped: _total" used
    // to land under the SAME name as the escaped reserved key —
    // silently merging two distinct stages. The prefix now recurses, so
    // the two records stay distinguishable.
    Laps.begin()
    Laps.record(Laps.ReservedTotalKey, 2.0)
    Laps.record("escaped: _total", 1.0)
    val got = Laps.end()
    assert(got == Seq(("escaped: _total", 2.0), ("escaped: escaped: _total", 1.0)))
  }

  test("begin discards a previous window's leftovers") {
    Laps.begin()
    Laps.record("orphan", 9.0)
    // no end(): simulates a query that failed mid-window
    Laps.begin()
    Laps.record("fresh", 1.0)
    assert(Laps.end() == Seq(("fresh", 1.0)))
  }
}
