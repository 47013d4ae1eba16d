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

  test("flatMapGroupsWithState emits each closed session exactly once") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_fmgws_src"
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts", "value")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[StatefulOps.SessionEvent]
    val q = StatefulOps.completedSessions(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgws_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("fmgws_out")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
        round(col("session_value"), 4).as("v"))
      .collect().map(_.toString).sorted

    // batch reference: q16-style sessionization; a session is emitted iff
    // its event-time timeout (ms floor) passed the final watermark (= max
    // event time at 0s delay, ms floor)
    val gapMs = 30L * 60L * 1000L
    val ev = spark.read.parquet(dir)
      .withColumn("us", unix_micros(col("ts")))
    val maxMs = ev.agg(max(col("us"))).first().getLong(0) / 1000L
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("us", "value")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_sess").over(cum))
      .groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"), round(sum("value"), 4).as("v"))
      .filter(expr("end_us div 1000") + lit(gapMs) < lit(maxMs))
      .select("user_id", "start_us", "end_us", "n_events", "v")
    val want = sessions.collect().map(_.toString).sorted
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq,
      s"stream=${got.length} batch=${want.length}")
  }
}
