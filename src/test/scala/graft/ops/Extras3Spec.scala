package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class Extras3Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q76: banded candidate generation loses no pair vs all-pairs (ham<=3)") {
    graft.functions.GraftFunctions.register(spark)
    def t3(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)
    val banded = Extras3.q76SimhashBanded.fn(spark, sf)
      .select("i", "j", "ham").collect().map(t3).toSet
    val sig = Tables.documents(spark, sf)
      .withColumn("tints", graft.functions.GraftFunctions.shingle3(col("text"), 15))
      .filter(size(col("tints")) > 0)
      .withColumn("h", graft.functions.GraftFunctions.simhash60(col("tints")))
      .select(col("doc_id"), col("h"))
    val allPairs = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("ham", bit_count(col("a.h").bitwiseXOR(col("b.h"))))
      .filter(col("ham") <= 3)
      .select(col("a.doc_id"), col("b.doc_id"), col("ham"))
      .collect().map(t3).toSet
    assert(banded == allPairs)
    assert(allPairs.nonEmpty) // fixtures plant near-dups; empty would be vacuous
  }

  test("q77: full outer keeps unmatched nations from both sides") {
    val rows = Extras3.q77FullOuter.fn(spark, sf).collect()
    val c = Tables.customer(spark, sf).filter(col("c_acctbal") > 9000)
      .select("c_nationkey").distinct().collect().map(_.getAs[Number](0).longValue).toSet
    val s = Tables.supplier(spark, sf).filter(col("s_acctbal") > 9000)
      .select("s_nationkey").distinct().collect().map(_.getAs[Number](0).longValue).toSet
    assert(rows.map(_.getAs[Number](0).longValue).toSet == (c ++ s))
    assert(rows.forall(r => r.getAs[Number](1).longValue > 0 || r.getAs[Number](3).longValue > 0))
  }

  test("q80: exactly one current row per customer, intervals chain") {
    val rows = Extras3.q80Scd2.fn(spark, sf)
      .select("custkey", "valid_from", "valid_to", "is_current").collect()
    rows.groupBy(_.getAs[Number](0).longValue).foreach { case (_, rs) =>
      assert(rs.count(_.getInt(3) == 1) == 1)
      val sorted = rs.sortBy(r => (r.getDate(1).toString, if (r.isNullAt(2)) "~" else r.getDate(2).toString))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.isNullAt(2) || a.getDate(2).toString <= b.getDate(1).toString ||
          a.getDate(2).toString >= a.getDate(1).toString)
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }
}
