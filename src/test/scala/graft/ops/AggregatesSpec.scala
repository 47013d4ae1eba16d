package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AggregatesSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within its 2% target error (5% tolerance)") {
    val rows = Aggregates.q37ApproxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("approx_percentile stays within 1% relative error of exact quantiles") {
    val rows = Extras6.q123ApproxPercentile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getSeq[Double](1)
      val exact = r.getSeq[Double](2)
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.01, s"flag=${r.getString(0)} approx=$a exact=$e")
      }
    }
  }

  test("cube emits all four grouping combinations") {
    val rows = Aggregates.q35Cube.fn(spark, sf).collect()
    val combos = rows.map(r => (r.getString(0) == "ALL", r.getString(1) == "ALL")).toSet
    assert(combos == Set((false, false), (false, true), (true, false), (true, true)))
    // grand total row equals table count
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand.head.getLong(2) == 1500)
  }
}
