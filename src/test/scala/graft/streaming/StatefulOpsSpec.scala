package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.streaming.StatefulOps.UserEvent

/** Drives mapGroupsWithState as a REAL streaming query and checks the final
  * per-user state equals the batch aggregate over the same input.
  */
class StatefulOpsSpec extends AnyFunSuite with SparkSpec {

  test("stateful running totals converge to the batch aggregate") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stateful_src"
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir).as[UserEvent]
    val q = StatefulOps.runningUserTotals(stream)
      .writeStream.outputMode(StatefulOps.outputMode)
      .format("memory").queryName("stateful_out").start()
    try q.processAllAvailable() finally q.stop()

    // last update per user is the final state
    val finalState = spark.table("stateful_out")
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
  }
}
