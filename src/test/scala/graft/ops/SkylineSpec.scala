package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q211's two-phase skyline: the oracle gate checks final equality, but the
  * local-sweep pruning could silently regress to emitting everything (no
  * pruning) or drop a frontier point (unfixable downstream). Both halves
  * pinned against the brute-force dominance definition on the fixture.
  */
class SkylineSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("skyline equals brute-force dominance filter; no point dominates another") {
    val out = Extras6.q211Skyline.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.nonEmpty)
    // pairwise: no output point may dominate another output point
    for (a <- out; b <- out if a != b)
      assert(!(b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)),
        s"$b dominates $a inside the reported skyline")
    // completeness: brute force over the full per-part point set
    val pts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.min("l_extendedprice").as("x"),
        org.apache.spark.sql.functions.sum("l_quantity").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val brute = pts.filter(p => !pts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)))
    assert(out.map(_._1).toSet == brute.map(_._1).toSet,
      s"skyline ${out.map(_._1).toSet} != brute ${brute.map(_._1).toSet}")
  }
}
