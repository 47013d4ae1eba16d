package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins for the round-11 TPC-H decorrelation batch (q334-q337). */
class Extras10Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q334: the distribution keeps the zero-order customers (the " +
    "filter-in-ON property) and accounts for every customer") {
    // sf0.01: the smallest fixture where a low-priority-only customer
    // exists, so the 0 bucket is actually exercised
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q334_tpch_q13")(spark, sf01).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.customer(spark, sf01).count(),
      "every customer must land in exactly one count bucket")
    // a WHERE-style filter (instead of ON) would have dropped this bucket
    assert(rows.exists(_.getAs[Long]("c_count") == 0L),
      "the zero-order bucket is the query's point")
  }

  test("q335: every reported supplier carries exactly the maximal revenue") {
    val rows = SparkEntry.queries("q335_tpch_q15")(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"non-maximal supplier leaked in: $revs")
  }

  test("q336: excluded suppliers never contribute to a class count") {
    val df = SparkEntry.queries("q336_tpch_q16")(spark, sf)
    assert(df.collect().nonEmpty)
    // recompute one class's count with the exclusion applied by hand
    val rel = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct()
      .filter(pmod(col("l_suppkey"), lit(5)) =!= 0)
    val p = Tables.part(spark, sf)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    val expected = rel.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("c")).count()
    assert(df.count() == expected)
  }

  test("q338: every Jaccard bucket is populated with sane error means, " +
    "and the one-bit estimator never beats full width on the pooled MAE") {
    val rows = SparkEntry.queries("q338_bbit_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") > 0)
      Seq("mae_full", "mae_bbit").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $r")
      }
    }
    def pooled(c: String) = rows.map(r =>
      r.getAs[Double](c) * r.getAs[Long]("n_pairs")).sum
    assert(pooled("mae_bbit") >= pooled("mae_full") - 1e-9,
      "1 bit of 32 cannot be MORE accurate than all 32 in aggregate")
  }

  test("q339: greedy marginal gains are non-increasing (submodularity) " +
    "and coverage accounting closes") {
    val rows = SparkEntry.queries("q339_max_coverage")(spark, sf)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[String]("source")).distinct.length == 5)
    rows.map(_.getAs[Long]("newly_covered")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "greedy gain increased")
      case _ =>
    }
    val cums = rows.map(_.getAs[Long]("cum_covered"))
    assert(cums.last == rows.map(_.getAs[Long]("newly_covered")).sum)
    assert(rows.last.getAs[Double]("coverage_share") <= 1.0 + 1e-9)
  }

  test("q340: Hamilton apportionment hands out the budget exactly, and " +
    "allocation follows the Neyman weight ordering") {
    val rows = SparkEntry.queries("q340_neyman_allocation")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder must sum to the budget with zero drift")
    rows.foreach(r => assert(r.getAs[Long]("alloc") >= 0L))
    // monotone in the reported share up to the ±1 remainder seat
    val byShare = rows.sortBy(-_.getAs[Double]("share"))
    byShare.map(_.getAs[Long]("alloc")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1,
        "allocation order diverged from Neyman weights by more than a seat")
      case _ =>
    }
  }

  test("q337: the result is non-empty (the recency-scoped anti join is " +
    "load-bearing) and only the chosen cohorts appear") {
    val rows = SparkEntry.queries("q337_tpch_q22")(spark, sf).collect()
    assert(rows.nonEmpty,
      "an empty Q22 means the anti join filtered nothing this fixture tests")
    rows.foreach { r =>
      assert(Set(1L, 3L, 5L).contains(r.getAs[Long]("code")), r.toString)
      assert(r.getAs[Long]("numcust") > 0, r.toString)
    }
  }
}
