package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  test("re-delivered rows are dropped on id within the watermark horizon") {
    val tmp = sys.props("java.io.tmpdir")
    val src = s"$tmp/graft_sdedup_src"
    val p = new org.apache.hadoop.fs.Path(src)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type")
    // every event delivered twice (two identical files = at-least-once replay)
    ev.coalesce(1).write.mode("append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)
    val distinctIds = ev.select("event_id").distinct().count()
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingDedup.dedup(stream, Seq("event_id"), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sdedup_out")
    assert(got.count() == distinctIds)
    assert(got.select("event_id").distinct().count() == distinctIds)
  }

  test("content-hash dedup collapses payload duplicates") {
    val tmp = sys.props("java.io.tmpdir")
    val src = s"$tmp/graft_sdedup_doc_src"
    val p = new org.apache.hadoop.fs.Path(src)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    // docs carry no event time; stamp a constant one (ingest time stand-in)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .withColumn("ingest_ts", lit("2026-01-01 00:00:00").cast("timestamp"))
    docs.coalesce(1).write.mode("append").parquet(src)
    docs.coalesce(1).write.mode("append").parquet(src)
    val distinctTexts = docs.select(md5(col("text"))).distinct().count()
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingDedup.dedupByContent(stream, "text", "ingest_ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_doc_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("sdedup_doc_out").count() == distinctTexts)
  }
}
