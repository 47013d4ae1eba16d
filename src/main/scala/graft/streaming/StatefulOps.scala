package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator (SURVEY.md §2.2 "stateful"): per-user
  * running event counts and value totals via `mapGroupsWithState` — the
  * escape hatch for stateful semantics windows can't express.
  *
  * State per key is one [[UserRunning]] (constant size), so at 100 TB/day
  * state scales with distinct active users, not event volume; a production
  * variant would use an event-time timeout to expire idle users.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  def updateUser(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserRunning]): UserRunning = {
    val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
    var n = prev.n_events
    var total = prev.total_value
    events.foreach { e => n += 1; total += e.value }
    val next = UserRunning(userId, n, total)
    state.update(next)
    next
  }

  /** Works on a static or streaming Dataset; in streaming, emits the updated
    * running totals each micro-batch (use OutputMode.Update).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    implicit val runningEnc = Encoders.product[UserRunning]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateUser)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
