package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Stream-stream interval join: errors joined to the same user's clicks in
  * the preceding 5 minutes, both sides watermarked so join state is bounded
  * by the interval + watermark (the only way a stream⋈stream join survives
  * unbounded input). Result must equal the identical batch join.
  */
class StreamStreamJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val staged: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_ssj_src"
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def sides(src: DataFrame): (DataFrame, DataFrame) = (
    src.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("e_user"), col("ts").as("e_ts")),
    src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts")))

  private val joinCond =
    "e_user = c_user AND c_ts >= e_ts - INTERVAL 5 MINUTES AND c_ts <= e_ts"

  test("stream-stream interval join equals the batch join") {
    val schema = spark.read.parquet(staged).schema
    val (errS, clickS) = sides(spark.readStream.schema(schema).parquet(staged))
    val joined = errS.withWatermark("e_ts", "10 minutes")
      .join(clickS.withWatermark("c_ts", "10 minutes"), expr(joinCond))
      .select("err_id", "click_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_out").collect().map(_.toString).sorted

    val (errB, clickB) = sides(spark.read.parquet(staged))
    val batch = errB.join(clickB, expr(joinCond))
      .select("err_id", "click_id").collect().map(_.toString).sorted

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.length} batch=${batch.length}")
  }
}
