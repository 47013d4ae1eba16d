package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The q284 dataset-fingerprint properties that make it a usable replica
  * check: layout invariance (same digests under any repartitioning) and
  * tamper evidence (one changed row flips exactly its bucket's digest).
  */
class FingerprintSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Stage `li` as $dir/lineitem.parquet and run q284 over it. */
  private def fingerprintOf(li: DataFrame, tag: String): Map[Long, (Long, Long, Long)] = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_fp_$tag"
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    graft.SparkEntry.queries("q284_dataset_fingerprint")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("digests are invariant under storage layout (repartition/order)") {
    val li = graft.Tables.lineitem(spark, sf)
    val base = fingerprintOf(li, "base")
    // same data, hostile layouts: 1 partition; 13 hash partitions on a
    // column UNRELATED to the bucket; fully re-sorted — the XOR fold must
    // not notice any of them
    assert(fingerprintOf(li.repartition(1), "p1") == base)
    assert(fingerprintOf(li.repartition(13, col("l_partkey")), "p13") == base)
    assert(fingerprintOf(li.orderBy(desc("l_extendedprice")), "sorted") == base)
  }

  test("a single tampered row flips its bucket digest and no other") {
    val li = graft.Tables.lineitem(spark, sf)
    val base = fingerprintOf(li, "base2")
    val victim = li.select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber").head()
    val (ok, ln) = (victim.getLong(0), victim.getInt(1))
    val tampered = li.withColumn("l_quantity",
      when(col("l_orderkey") === ok && col("l_linenumber") === ln,
        col("l_quantity") + 1).otherwise(col("l_quantity")))
    val got = fingerprintOf(tampered, "tamper")
    val changed = base.keySet.filter(b => base(b) != got(b))
    assert(changed == Set(ok % 64), s"changed buckets: $changed")
    // row count in the tampered bucket unchanged — only the digest moved
    assert(base(ok % 64)._1 == got(ok % 64)._1)
  }
}
