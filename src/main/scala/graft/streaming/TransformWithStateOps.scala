package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing through Spark 4's `transformWithState` —
  * the successor API to mapGroupsWithState: typed per-key state primitives
  * (ValueState/ListState/MapState) against the RocksDB state store, state
  * TTL, and timers, designed for state that outgrows executor heap (the
  * 100 TB case: state lives off-heap in RocksDB and snapshots to the
  * checkpoint location incrementally).
  *
  * Same contract as [[StatefulOps.runningUserTotals]] so the parity spec can
  * hold the two APIs to identical results.
  */
object TransformWithStateOps {

  import StatefulOps.{UserEvent, UserRunning}

  /** Per-user running totals in a single O(1) ValueState cell per key. */
  class RunningTotalsProcessor extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(key, n, total)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Needs `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState only runs on RocksDB).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    implicit val outEnc: Encoder[UserRunning] = Encoders.product[UserRunning]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
