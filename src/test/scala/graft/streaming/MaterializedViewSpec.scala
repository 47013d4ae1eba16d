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

  test("crashed swap (stage present, canonical vacant) recovers, not clobbers") {
    freshDatabase("mvcrash")
    import spark.implicits._
    // simulate a death between 'RENAME target TO __mv_old' and the stage
    // promotion: the canonical name is vacant, the stranded STAGE holds the
    // complete merged snapshot, __mv_old holds the superseded one
    Seq((1, 10L), (2, 20L)).toDF("k", "n")
      .write.saveAsTable("mvcrash.mv__mv_stage")
    Seq((1, 1L)).toDF("k", "n").write.saveAsTable("mvcrash.mv__mv_old")
    // the next upsert must promote the stage and merge into IT — the
    // unrecovered path would take the create branch and seed the MV from
    // this single batch, losing rows (1,10) entirely
    MaterializedView.upsert(
      Seq((2, 25L), (3, 30L)).toDF("k", "n"), Seq("k"), "mvcrash.mv")
    val out = spark.table("mvcrash.mv").as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 10L, 2 -> 25L, 3 -> 30L))
    val leftovers = spark.catalog.listTables("mvcrash")
      .collect().map(_.name).filter(_.contains("__mv_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("refresh after a crashed swap also recovers first") {
    freshDatabase("mvcrash2")
    import spark.implicits._
    Seq((7, 70L)).toDF("k", "n").write.saveAsTable("mvcrash2.mv__mv_stage")
    MaterializedView.refresh(
      Seq((8, 80L)).toDF("k", "n"), "mvcrash2.mv")
    val out = spark.table("mvcrash2.mv").as[(Int, Long)].collect().toMap
    assert(out == Map(8 -> 80L)) // refresh REPLACES — stage residue is gone
    val leftovers = spark.catalog.listTables("mvcrash2")
      .collect().map(_.name).filter(_.contains("__mv_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
