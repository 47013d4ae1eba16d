package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The write-audit-publish FAILURE path — the half the q225 oracle cannot
  * see (the fixture data passes all audits): a staged batch that violates
  * an audit must publish NOTHING and leave no staging residue behind.
  */
class WapSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("all audits green: staging promotes atomically, staging dir gone") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_waptest/ok"
    val data = graft.Tables.orders(spark, sf)
    val (staged, passed, ok, pub) =
      Layout.wapPublish(spark, base, data, Layout.wapAudits)
    assert(ok && passed == 3 && pub == staged && staged > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/staging")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/published")))
  }

  test("failing audit: nothing published, staging cleaned up") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_waptest/bad"
    // poison one row's key with NULL so the null-key audit trips
    val data = graft.Tables.orders(spark, sf)
      .withColumn("o_orderkey",
        when(col("o_orderkey") === 1L, lit(null)).otherwise(col("o_orderkey")))
    val (staged, passed, ok, pub) =
      Layout.wapPublish(spark, base, data, Layout.wapAudits)
    assert(!ok && passed == 2 && pub == 0L && staged > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/staging")),
      "failed staging must be deleted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/published")),
      "nothing may be published on audit failure")
  }
}
