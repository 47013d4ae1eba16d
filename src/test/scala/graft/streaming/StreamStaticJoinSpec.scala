package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Stream-static enrichment join: a stream of order rows joined to the
  * static customer dimension. The static side needs no watermark and no
  * state — each micro-batch plans a fresh broadcast-able join against it
  * (the standard "enrich events with dimensions" topology; at 100 TB/day of
  * stream the static dim join must stay stateless or state explodes).
  */
class StreamStaticJoinSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val staged: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_stsj_src"
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("stream-static join equals the batch join and keeps no state") {
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val schema = spark.read.parquet(staged).schema
    val enriched = spark.readStream.schema(schema).parquet(staged)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("stsj_out").start()
    try {
      q.processAllAvailable()
      val progress = q.lastProgress
      // stateless join: only the aggregation holds state
      assert(progress.stateOperators.length == 1, progress.toString())
    } finally q.stop()
    val streamed = spark.table("stsj_out")
      .orderBy("c_mktsegment").collect().map(_.toString).toSeq

    val batch = Tables.orders(spark, sf)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      .orderBy("c_mktsegment").collect().map(_.toString).toSeq

    assert(streamed.nonEmpty && streamed == batch,
      s"stream=${streamed.mkString(",")} batch=${batch.mkString(",")}")
  }
}
