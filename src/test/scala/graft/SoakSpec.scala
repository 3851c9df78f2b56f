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
}
