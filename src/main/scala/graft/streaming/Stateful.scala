package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  implicit val eventEnc: org.apache.spark.sql.Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit val stateEnc: org.apache.spark.sql.Encoder[UserState] = Encoders.product[UserState]
  implicit val updateEnc: org.apache.spark.sql.Encoder[UserUpdate] = Encoders.product[UserUpdate]
  implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

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

  case class FpDoc(fp: Long, doc_id: Long)

  implicit val fpDocEnc: org.apache.spark.sql.Encoder[FpDoc] = Encoders.product[FpDoc]

  /** Streaming first-seen filter on the `transformWithState` API (the
    * Spark 4 arbitrary-state processor): emit a document only the FIRST
    * time its fingerprint is seen — the streaming analog of exact dedup
    * for a curation pipeline. State is one boolean per live fingerprint,
    * shuffled on fp.
    *
    * With a TTL the marker expires after the last write, bounding the
    * store by PROCESSING time — the complement to
    * `dropDuplicatesWithinWatermark` (which bounds state by EVENT time).
    * Note the TTL form runs in TimeMode.ProcessingTime, where the engine
    * keeps scheduling eviction micro-batches even with no new data —
    * correct for a production stream, but `processAllAvailable()` in a
    * default-trigger test never quiesces; test the unbounded form, or
    * use an explicit trigger.
    *
    * Requires the RocksDB state store provider (transformWithState's
    * backing store) — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...RocksDBStateStoreProvider` on the session running the query.
    */
  class FirstSeenProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, FpDoc, FpDoc] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[FpDoc],
        timerValues: TimerValues): Iterator[FpDoc] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        // within one micro-batch, duplicates of a new key also collapse
        // to the first row (iterator order = shuffle-stable batch order)
        if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
      }
    }
  }

  /** First occurrence of each fingerprint across the stream's lifetime
    * (within the TTL window when one is given); duplicates — in-batch or
    * cross-batch — are dropped.
    */
  def firstSeen(docs: Dataset[FpDoc],
                ttl: Option[java.time.Duration] = None): Dataset[FpDoc] =
    docs.groupByKey(_.fp)
      .transformWithState(new FirstSeenProcessor(ttl),
        ttl.map(_ => TimeMode.ProcessingTime()).getOrElse(TimeMode.None()),
        OutputMode.Append())
}
