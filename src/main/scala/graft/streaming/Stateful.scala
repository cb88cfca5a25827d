package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY §2.3 streaming row:
  * `flatMapGroupsWithState`): running per-user statistics that survive
  * across micro-batches, with an optional processing-time timeout that
  * expires idle users' state (bounding the state store exactly like a
  * watermark bounds windowed aggregations).
  *
  * State is keyed by user — the shuffle is on user_id, so state scales
  * horizontally with executors; each key's state is a constant-size
  * record regardless of event volume.
  */
object Stateful {

  case class UserEvent(user_id: Long, value: Double)
  case class UserState(n_events: Long, sum_value: Double)
  case class UserUpdate(user_id: Long, n_events: Long, sum_value: Double)

  implicit val eventEnc = Encoders.product[UserEvent]
  implicit val stateEnc = Encoders.product[UserState]
  implicit val updateEnc = Encoders.product[UserUpdate]
  implicit val longEnc = Encoders.scalaLong

  /** One UserUpdate per (user, micro-batch) with totals accumulated over
    * the stream's lifetime. Works identically on a batch Dataset (state
    * starts empty and the single "batch" folds through).
    */
  def runningUserStats(events: Dataset[UserEvent],
                       timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
  : Dataset[UserUpdate] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            var n = prev.n_events
            var s = prev.sum_value
            it.foreach { e => n += 1; s += e.value }
            val next = UserState(n, s)
            state.update(next)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            Iterator.single(UserUpdate(user, next.n_events, next.sum_value))
          }
      }
}
