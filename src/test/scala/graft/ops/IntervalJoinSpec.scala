package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class IntervalJoinSpec extends AnyFunSuite with SparkSpec {

  private def sides() = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    (ev.filter(col("event_type") === "error")
       .select(col("user_id"), unix_micros(col("ts")).as("e_us"),
         col("event_id").as("err_id")),
     ev.filter(col("event_type") === "click")
       .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
         col("event_id").as("click_id")))
  }

  test("bucketed interval join equals the naive non-equi join") {
    val (err, clk) = sides()
    val w = 300000000L // 5 minutes in µs
    val bucketed = IntervalJoin.lookback(err, clk, "user_id", "e_us", "c_us", w)
      .select("err_id", "click_id").collect().map(_.toString).sorted
    val naive = err.join(clk.withColumnRenamed("user_id", "c_user"),
        col("user_id") === col("c_user") &&
          col("c_us") >= col("e_us") - w && col("c_us") <= col("e_us"))
      .select("err_id", "click_id").collect().map(_.toString).sorted
    assert(bucketed.nonEmpty)
    assert(bucketed.toSeq == naive.toSeq,
      s"bucketed=${bucketed.length} naive=${naive.length}")
  }

  test("bucketed form avoids the nested-loop join") {
    val (err, clk) = sides()
    val p = IntervalJoin.lookback(err, clk, "user_id", "e_us", "c_us", 300000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }
}
