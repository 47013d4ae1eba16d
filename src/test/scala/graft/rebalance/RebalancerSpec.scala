package graft.rebalance

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RebalancerSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String) =
    s"${sys.props("java.io.tmpdir")}/graft_rebalancer_spec/$tag"

  private def multiset(path: String): Map[Long, Long] = {
    spark.read.parquet(path).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private lazy val src = {
    import spark.implicits._
    (1L to 10000L).map(i => (i % 97, i.toDouble)).toDF("k", "v")
  }

  test("hash redistribution preserves the row multiset") {
    val dest = tmp("hash")
    val n = Rebalancer.redistribute(src, Rebalancer.ByHash("k"), 8, dest)
    assert(n == 10000)
    assert(multiset(dest) == src.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("hash redistribution co-locates each key in one file") {
    val dest = tmp("hash_colocate")
    Rebalancer.redistribute(src, Rebalancer.ByHash("k"), 8, dest)
    val perFile = spark.read.parquet(dest)
      .withColumn("file", input_file_name())
      .groupBy("k").agg(countDistinct("file").as("nf"))
      .agg(max("nf")).first().getLong(0)
    assert(perFile == 1, "a shard key was split across output shards")
  }

  test("range redistribution preserves rows and orders shard boundaries") {
    val dest = tmp("range")
    val n = Rebalancer.redistribute(src, Rebalancer.ByRange("k"), 4, dest)
    assert(n == 10000)
  }

  test("swap replaces prior contents atomically (second run wins)") {
    import spark.implicits._
    val dest = tmp("swap")
    Rebalancer.redistribute(Seq((1L, 1.0)).toDF("k", "v"), Rebalancer.RoundRobin, 2, dest)
    Rebalancer.redistribute(Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v"), Rebalancer.RoundRobin, 2, dest)
    val got = spark.read.parquet(dest).select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("property: row count is preserved for arbitrary shard counts") {
    import spark.implicits._
    val gen = Gen.choose(1, 16)
    val shardsSamples = (0 until 5).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(shardsSamples.nonEmpty)
    shardsSamples.distinct.foreach { shards =>
      val dest = tmp(s"prop_$shards")
      val df = (1L to 500L).map(i => (i % 13, i.toDouble)).toDF("k", "v")
      val n = Rebalancer.redistribute(df, Rebalancer.ByHash("k"), shards, dest)
      assert(n == 500, s"shards=$shards")
    }
  }
}
