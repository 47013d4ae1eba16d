package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins q297's absorption-probability fixpoint on hand-computed chains:
  * exact conversion rates, removal-effect semantics (blocked mass is lost,
  * not renormalized), and convergence well inside the 25 iterations.
  */
class MarkovAttributionSpec extends AnyFunSuite {

  test("two-path chain: exact absorption and removal effects") {
    // journeys: START->view->purchase and START->click->NOCONV
    val counts = Map(
      ("START", "view") -> 1L, ("view", "purchase") -> 1L,
      ("START", "click") -> 1L, ("click", "NOCONV") -> 1L)
    val base = Extras7.absorptionCvr(counts, None, 25)
    assert(math.abs(base - 0.5) < 1e-12)
    // removing the converting channel kills all conversion
    assert(math.abs(Extras7.absorptionCvr(counts, Some("view"), 25)) < 1e-12)
    // removing the dead-end channel changes nothing
    assert(math.abs(Extras7.absorptionCvr(counts, Some("click"), 25) - 0.5) < 1e-12)
  }

  test("loopy chain converges: geometric self-loop resolves to the closed form") {
    // START->a (p=1); a->a (p=1/2), a->purchase (p=1/4), a->NOCONV (p=1/4)
    // absorption from a: x = 1/2 x + 1/4  =>  x = 1/2
    val counts = Map(
      ("START", "a") -> 4L,
      ("a", "a") -> 2L, ("a", "purchase") -> 1L, ("a", "NOCONV") -> 1L)
    val got = Extras7.absorptionCvr(counts, None, 25)
    assert(math.abs(got - 0.5) < 1e-7, s"got $got") // (1/2)^25 residual
  }

  test("unreachable channel has zero removal effect") {
    val counts = Map(
      ("START", "view") -> 1L, ("view", "purchase") -> 1L)
    val base = Extras7.absorptionCvr(counts, None, 25)
    assert(math.abs(base - 1.0) < 1e-12)
    assert(math.abs(Extras7.absorptionCvr(counts, Some("error"), 25) - base) < 1e-12)
  }
}
