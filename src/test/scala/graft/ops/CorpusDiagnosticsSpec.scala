package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Invariants behind the corpus-diagnostic queries q191 (Zipf fit) and
  * q192 (PCA power iteration) — the oracle gate pins exact values; these
  * pin the properties that make the values meaningful.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q191: Zipf slope is negative and r2 is a valid share") {
    val r = Text.q191ZipfFit.fn(spark, sf).head()
    assert(r.getDouble(1) < 0.0, s"zipf slope ${r.getDouble(1)} not negative")
    val r2 = r.getDouble(3)
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("q192: principal loadings are unit-norm and eigval is positive") {
    val rows = Vectors.q192PcaPower.fn(spark, sf).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(_.getDouble(1)).map(x => x * x).sum
    // rounded to 3 digits per component -> norm can drift by ~64 * 1e-3
    assert(math.abs(norm2 - 1.0) < 0.05, s"loading norm^2 $norm2 far from 1")
    val eig = rows.map(_.getDouble(2)).distinct
    assert(eig.length == 1 && eig.head > 0.0)
  }
}
