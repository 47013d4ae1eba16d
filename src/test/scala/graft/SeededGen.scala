package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic ScalaCheck sampling for property specs: n samples from
  * consecutive fixed seeds, so every run generates the identical cases (no
  * flaky CI) and a failure message's index identifies the exact sample.
  * Shared by the codec/rewriter/function property suites.
  */
trait SeededGen {
  protected def sample[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))
}
