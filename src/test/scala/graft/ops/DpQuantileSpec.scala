package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins q301's Gumbel-max exponential mechanism on the sf0.001 fixture:
  * the release stays in the candidate domain, the reported rank error is
  * consistent with the released value's true rank distance, and the
  * derandomized mechanism is bit-stable across runs.
  */
class DpQuantileSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("release is in-domain, rank-error-consistent, and deterministic") {
    val run1 = Training.q301DpQuantile.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[Long]("n"),
        r.getAs[Long]("true_median"), r.getAs[Long]("dp_median"),
        r.getAs[Long]("dp_rank_err"))).sortBy(_._1)
    assert(run1.nonEmpty)
    run1.foreach { case (flag, n, tm, dp, err) =>
      assert(dp >= 1 && dp <= 50, s"$flag: dp_median $dp out of domain")
      assert(tm >= 1 && tm <= 50)
      assert(err >= 0 && err <= 2 * n, s"$flag: rank err $err vs n $n")
      // the true median's own rank error is the minimum achievable (<= any
      // release's), and a release AT the true median has err = |2cum - n|
      if (dp == tm) assert(err <= n)
    }
    val run2 = Training.q301DpQuantile.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[Long]("n"),
        r.getAs[Long]("true_median"), r.getAs[Long]("dp_median"),
        r.getAs[Long]("dp_rank_err"))).sortBy(_._1)
    assert(run1.toSeq == run2.toSeq) // derandomized: bit-stable
  }

  test("utility dominates noise at high epsilon-equivalent separation") {
    // the score of the true median beats any candidate whose rank error
    // exceeds it by >> Gumbel scale: with utilities / 4 and Gumbel noise
    // of O(1), a 100+ rank gap (25 score units) cannot be outvoted; so
    // the release's rank error is never catastrophic on this fixture
    Training.q301DpQuantile.fn(spark, dir).collect().foreach { r =>
      val n = r.getAs[Long]("n")
      val err = r.getAs[Long]("dp_rank_err")
      assert(err < n / 2, s"release in the far tail: err $err of n $n")
    }
  }
}
