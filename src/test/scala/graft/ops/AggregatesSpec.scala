package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AggregatesSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within its error bound (driver-checkable boolean)") {
    val rows = Aggregates.q37ApproxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"flag=${r.getString(0)} exact=${r.getLong(1)} approx out of 5% bound")
    }
  }

  test("approx_percentile stays within its error bound at every quantile") {
    val rows = Extras6.q123ApproxPercentile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(4, 5, 6).foreach { c =>
        assert(r.getBoolean(c),
          s"flag=${r.getString(0)} quantile col $c out of 2% bound")
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
