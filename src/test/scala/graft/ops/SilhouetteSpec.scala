package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q190's centroid silhouette: range and accounting sanity on the fixture
  * (the oracle gate pins exact values; this keeps the invariants visible
  * if the query is ever refactored).
  */
class SilhouetteSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-cluster silhouette is in [-1, 1] and members account for every vector") {
    val out = Vectors.q190Silhouette.fn(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 6)
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, s"cluster ${r.getInt(0)} avg_sil $s out of range")
    }
  }
}
