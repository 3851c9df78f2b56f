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

  test("exponent fit: recovers exact power laws and separates n^1.5 from linear") {
    // The three-point gate's arithmetic (VERDICT r15 #3): times that
    // ARE a power law t = c·n^p must fit exactly p regardless of the
    // constant — so a linear stage with any constant passes the 1.3
    // arrival limit, and an n^1.5 stage with a SMALL constant (the
    // shape the two-point 15× ratio gate waves through: 10^1.5 ≈
    // 31.6×... no — 1.5^... a 0.1s-at-sf0.1 stage reading 3.16s at
    // sf1 is under the 15× ratio only via MinGateSecs, but its
    // exponent reads 1.5 the moment it crosses the floor) fails it.
    import graft.tools.Soak
    val xs = Seq(1.0, 3.0, 10.0).map(math.log)
    def times(c: Double, p: Double) = Seq(1.0, 3.0, 10.0).map(n => c * math.pow(n, p))
    assert(math.abs(Soak.fittedSlope(xs, times(7.0, 1.0).map(math.log)) - 1.0) < 1e-9)
    assert(math.abs(Soak.fittedSlope(xs, times(0.4, 1.5).map(math.log)) - 1.5) < 1e-9)
    assert(math.abs(Soak.fittedSlope(xs, times(2.0, 0.3).map(math.log)) - 0.3) < 1e-9)
    // non-power-law noise fits BETWEEN its local slopes, never wilder
    val noisy = Seq(1.0, 2.8, 11.5).map(math.log)
    val s = Soak.fittedSlope(xs, noisy)
    assert(s > 0.9 && s < 1.2, s"noisy fit $s")
  }
}
