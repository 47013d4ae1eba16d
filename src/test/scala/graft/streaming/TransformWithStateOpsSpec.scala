package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.streaming.StatefulOps.UserEvent

/** Drives transformWithState (RocksDB-backed) as a real streaming query and
  * checks final per-user state equals the batch aggregate — and therefore
  * also the mapGroupsWithState implementation it supersedes.
  */
class TransformWithStateOpsSpec extends AnyFunSuite with SparkSpec {

  test("transformWithState running totals converge to the batch aggregate") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_tws_src"
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema).parquet(dir).as[UserEvent]
      val q = TransformWithStateOps.runningUserTotals(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try q.processAllAvailable() finally q.stop()

      val finalState = spark.table("tws_out")
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"), max("total_value").as("total_value"))
      val batch = spark.read.parquet(dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      val a = finalState.collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sorted
      val b = batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sorted
      assert(a.nonEmpty && a.sameElements(b))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
