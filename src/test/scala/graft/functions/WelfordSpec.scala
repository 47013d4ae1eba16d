package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The property q241's Aggregator exists for: the (n, mean, M2) state
  * merges associatively, so the SAME statistic comes out under any
  * partitioning — and it stays conditioned where the naive Σx² identity
  * cancels.
  */
class WelfordSpec extends AnyFunSuite with SparkSpec {

  test("partitioning invariance: 1 vs 13 partitions agree to 1e-9") {
    import spark.implicits._
    val xs = (1 to 5000).map(i => (i % 7, math.sin(i) * 100 + 1e6))
    val wvar = udaf(new WelfordVariance)
    def run(parts: Int) = xs.toDF("k", "x").repartition(parts)
      .groupBy("k").agg(wvar(col("x")).as("w"))
      .select(col("k"), col("w._1"), col("w._2"), col("w._3"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val a = run(1); val b = run(13)
    a.zip(b).foreach { case ((k1, n1, m1, s1), (k2, n2, m2, s2)) =>
      assert(k1 == k2 && n1 == n2)
      assert(math.abs(m1 - m2) < 1e-9, s"mean drift $m1 vs $m2")
      assert(math.abs(s1 - s2) < 1e-9, s"stddev drift $s1 vs $s2")
    }
  }

  test("conditioned on a large mean where the naive identity cancels") {
    import spark.implicits._
    // values 1e9 + small noise: sum-of-squares cancellation loses ~all
    // significant digits of the true variance (~0.25); Welford keeps it
    val xs = (1 to 2000).map(i => 1e9 + (i % 2) - 0.5)
    val wvar = udaf(new WelfordVariance)
    val r = xs.toDF("x").agg(wvar(col("x"))).head().getStruct(0)
    val sd = r.getDouble(2)
    val exact = math.sqrt(2000 * 0.25 / 1999.0) // sample stddev of ±0.5
    assert(math.abs(sd - exact) < 1e-9, s"stddev $sd far from $exact")
  }
}
