package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** End-to-end MV materialization: file stream → windowed agg → foreachBatch
  * keyed upsert into a catalog table, refreshed incrementally across two
  * runs (checkpoint-restored state), final table == full batch recompute.
  */
class MaterializedViewSpec extends AnyFunSuite with SparkSpec {

  private def flatHourly(df: DataFrame): DataFrame =
    EventStreams.hourlyCounts(df).select(
      col("window.start").as("hour"), col("event_type"),
      col("n"), round(col("total_value"), 6).as("total_value"))

  test("incremental MV upsert equals batch recompute after two refreshes") {
    freshDatabase("mvdb")
    val tmp = sys.props("java.io.tmpdir")
    val srcDir = s"$tmp/graft_mv_src"
    val ckpt = s"$tmp/graft_mv_ckpt"
    for (d <- Seq(srcDir, ckpt)) {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value").persist()
    val cut = ev.selectExpr("percentile(CAST(ts AS DOUBLE), 0.5)").first().getDouble(0)
    // refresh 1: early half only (time-split keeps refresh 2 inside the
    // watermark, like real arrivals)
    ev.filter(col("ts").cast("double") <= cut)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def refresh(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = MaterializedView.materialize(
        flatHourly(stream), Seq("hour", "event_type"), "mvdb.events_hourly_mv", ckpt)
      q.awaitTermination()
    }
    refresh()
    val afterFirst = spark.table("mvdb.events_hourly_mv").count()
    assert(afterFirst > 0)
    // refresh 2: the late half arrives as new files; checkpointed state
    // resumes, update-mode emits only changed windows
    ev.filter(col("ts").cast("double") > cut)
      .coalesce(1).write.mode("append").parquet(srcDir)
    refresh()
    val mv = spark.table("mvdb.events_hourly_mv")
      .collect().map(_.toString).sorted
    val batch = flatHourly(spark.read.parquet(srcDir))
      .collect().map(_.toString).sorted
    assert(mv.length == batch.length)
    assert(mv.sameElements(batch))
    // swap hygiene: no stage/old shadows left behind
    val leftovers = spark.catalog.listTables("mvdb")
      .collect().map(_.name).filter(n => n.contains("__mv_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    ev.unpersist()
  }
}
