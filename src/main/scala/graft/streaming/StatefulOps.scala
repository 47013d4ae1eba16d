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

  // ---- flatMapGroupsWithState: session emission on event-time timeout ----

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: Double)
  final case class CompletedSession(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long, session_value: Double)

  /** Close-and-emit sessionization: a session emits exactly once, when the
    * 30-minute gap passes it (event-time timeout against the watermark) or
    * when a later event of the same user opens the next session. This is
    * the flatMapGroupsWithState shape — variable output per group per batch
    * — that mapGroupsWithState (one row per invocation) can't express.
    * State per user is one O(1) [[OpenSession]].
    */
  def sessionize(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession],
      gapMs: Long): Iterator[CompletedSession] = {
    def close(s: OpenSession) =
      CompletedSession(userId, s.startUs, s.lastUs, s.n, s.total)
    if (state.hasTimedOut) {
      val done = state.getOption.map(close).iterator
      state.remove()
      done
    } else {
      // full microsecond precision (Timestamp.getTime alone is ms-truncated)
      def micros(t: java.sql.Timestamp): Long =
        t.getTime / 1000L * 1000000L + t.getNanos / 1000L
      val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[CompletedSession]
      sorted.foreach { e =>
        val us = micros(e.ts)
        open match {
          case Some(s) if us - s.lastUs <= gapMs * 1000L =>
            open = Some(OpenSession(s.startUs, us, s.n + 1, s.total + e.value))
          case Some(s) =>
            closed += close(s)
            open = Some(OpenSession(us, us, 1L, e.value))
          case None =>
            open = Some(OpenSession(us, us, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
      }
      closed.result().iterator
    }
  }

  /** 30-minute-gap sessions over a watermarked stream (append mode: each
    * session exactly once, after it can no longer grow).
    */
  def completedSessions(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermarkDelay: String = "0 seconds"): Dataset[CompletedSession] = {
    implicit val enc = Encoders.product[CompletedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, es: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          sessionize(k, es, st, gapMs))
  }
}
