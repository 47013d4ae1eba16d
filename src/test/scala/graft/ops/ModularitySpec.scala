package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Value-level pins for q331's Newman-Girvan modularity identities. */
class ModularitySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q331: degree and intra-edge accounting close, and pooled Q is in " +
    "the modularity range") {
    val rows = SparkEntry.queries("q331_modularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute m and the total degree independently from the fixture
    val ps = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("k")).distinct()
    val m = ps.as("a").join(ps.as("b"),
        col("a.o") === col("b.o") && col("a.k") < col("b.k"))
      .select(col("a.k"), col("b.k")).distinct().count()
    val sumDc = rows.map(_.getAs[Long]("d_c")).sum
    assert(sumDc == 2 * m, s"sum of community degrees $sumDc != 2m = ${2 * m}")
    val sumMc = rows.map(_.getAs[Long]("m_c")).sum
    assert(sumMc <= m, "intra-community edges cannot exceed all edges")
    val q = rows.map(_.getAs[Double]("q_part")).sum
    assert(q >= -1.0 - 1e-6 && q <= 1.0 + 1e-6, s"pooled Q out of range: $q")
  }
}
