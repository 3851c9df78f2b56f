package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic pins for the sf1 soak harness (`graft.tools.Soak`) —
  * the soak itself is a once-per-round offline tool, but its gate
  * arithmetic must be falsifiable by construction.
  */
class SoakSpec extends AnyFunSuite {

  test("sf1 classifier floor: a constant predictor exactly fails it") {
    // A zero-weight model scores prob 0.5 everywhere → constant pred →
    // accuracy equals the majority-class rate exactly. The sf1 floor is
    // majority + margin, so that model must FAIL (VERDICT r14 #3: the
    // floor is non-vacuous), and an accuracy clearing the margin must
    // pass. Boundary: the floor is inclusive at exactly majority+margin.
    import graft.tools.Soak
    val majority = 0.51
    assert(!Soak.classifyFloorPasses(majority, majority),
      "a constant predictor (accuracy == majority) must fail the floor")
    assert(!Soak.classifyFloorPasses(
      majority + Soak.ClassifyMarginOverMajority - 1e-9, majority))
    assert(Soak.classifyFloorPasses(
      majority + Soak.ClassifyMarginOverMajority, majority))
    assert(Soak.ClassifyMarginOverMajority > 0.0,
      "a zero margin would make the floor vacuous")
  }

  test("tail exponent: exact on power laws, catches quadratic-small-constant the ratio gate misses") {
    // The three-point gate's arithmetic (VERDICT r15 #3, reworked
    // after the r16 review found the least-squares form vacuous): the
    // gated number is the TAIL segment's local slope, which a pure
    // power law t = c·n^p reads as exactly p (the constant cancels in
    // the ratio) and which a fixed overhead cannot dilute.
    import graft.tools.Soak
    def tail(ts: Seq[Double]) = Soak.segmentSlope(ts(1), ts(2), 3.0, 10.0)
    def head(ts: Seq[Double]) = Soak.segmentSlope(ts(0), ts(1), 1.0, 3.0)
    def times(c: Double, p: Double) = Seq(1.0, 3.0, 10.0).map(n => c * math.pow(n, p))
    for (p <- Seq(0.3, 1.0, 1.5); c <- Seq(0.4, 7.0)) {
      assert(math.abs(tail(times(c, p)) - p) < 1e-9)
      assert(math.abs(tail(times(c, p)) - head(times(c, p))) < 1e-9,
        "a pure power law has zero curvature")
    }
    // THE non-vacuity case: fixed overhead + quadratic term,
    // t = 1 + 0.1·n² → 1.1 / 1.9 / 11.0 seconds. Overall ratio 10×
    // passes the 15× arrival ratio gate; the tail slope reads the
    // quadratic through the dilution and trips the 1.3 limit.
    val quad = Seq(1.1, 1.9, 11.0)
    assert(quad.last / quad.head < 15.0, "the ratio gate must be blind to this shape")
    assert(tail(quad) > 1.3, s"tail ${tail(quad)} must trip the arrival limit")
    // constant-plus-LINEAR never reads as super-linear: tail < 1 and
    // curvature bounded (~0.28 worst near c ≈ 2.5a) — the AccelWarn
    // threshold sits above it so a benign fixed cost can't warn
    for (c <- Seq(0.1, 1.0, 2.5, 5.0, 20.0)) {
      val lin = Seq(1.0, 3.0, 10.0).map(n => c + n)
      assert(tail(lin) < 1.0)
      assert(tail(lin) - head(lin) < 0.45, s"linear+const c=$c curvature ${tail(lin) - head(lin)}")
    }
  }
}
