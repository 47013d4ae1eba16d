package graft.rebalance

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** The co-located-join scale path: writing both join sides bucketed by the
  * join key lets Spark plan the join with ZERO shuffle exchanges — at 100 TB
  * this converts every repeated fact⋈fact join from a full network shuffle
  * into local merges.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    freshDatabase("graft_bkt")
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.ord_b")

    val joined = spark.table("graft_bkt.li_b")
      .join(spark.table("graft_bkt.ord_b"),
        spark.table("graft_bkt.li_b")("l_orderkey") ===
          spark.table("graft_bkt.ord_b")("o_orderkey"))

    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed join should not shuffle, found ${shuffles.size} exchanges")
    assert(joined.count() == 6000)
  }

  test("unbucketed baseline of the same join does shuffle") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
    // disable auto-broadcast (honest shuffle join) and AQE (so the
    // executedPlan carries the inserted exchanges instead of wrapping them
    // in AdaptiveSparkPlanExec)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
