package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Drives the EventStreams transforms as REAL streaming queries (file
  * source → complete-mode memory sink) and checks batch/stream parity —
  * the property that makes them a materialized-view replacement.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private lazy val staged: String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stream_src"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def runStream(transform: DataFrame => DataFrame, name: String): DataFrame = {
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    val q = transform(stream).writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("hourly tumbling counts: stream == batch") {
    val streamed = runStream(EventStreams.hourlyCounts, "hourly_out")
      .select(col("window.start"), col("event_type"), col("n"), round(col("total_value"), 6))
    val batch = EventStreams.hourlyCounts(spark.read.parquet(staged))
      .select(col("window.start"), col("event_type"), col("n"), round(col("total_value"), 6))
    assert(canon(streamed).sameElements(canon(batch)))
    assert(streamed.count() > 0)
  }

  test("session windows: stream == batch") {
    val streamed = runStream(EventStreams.sessionAgg, "session_out")
      .select(col("session_window.start"), col("user_id"), col("n_events"))
    val batch = EventStreams.sessionAgg(spark.read.parquet(staged))
      .select(col("session_window.start"), col("user_id"), col("n_events"))
    assert(canon(streamed).sameElements(canon(batch)))
    assert(streamed.count() > 0)
  }

  test("sliding windows double-count events across overlapping windows") {
    val total = spark.read.parquet(staged).count()
    val windowed = EventStreams.slidingCounts(spark.read.parquet(staged))
      .agg(sum("n")).first().getLong(0)
    assert(windowed == 2 * total, s"each event must land in exactly 2 windows")
  }
}
