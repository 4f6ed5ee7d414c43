package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.io.Tables

/** Custom stateful processing (SURVEY.md §2.9 stream_stateful_session):
  * per-user sessionization through `flatMapGroupsWithState` — the Spark
  * primitive for arbitrary keyed state. The same function body serves
  *  - batch execution (this file's query entry; state machinery degenerates
  *    to one invocation per key), and
  *  - incremental execution under Trigger.AvailableNow (parity-tested in
  *    ScalaTest against the declarative gaps-and-islands form).
  *
  * Scale: state is per-user and bounded by a user's in-flight events; with
  * event-time timeout (production mode) closed sessions are emitted and
  * state evicted as the watermark passes — memory ∝ active users, not
  * history.
  */
object Stateful {

  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class SessionOut(
      user_id: Long, session_idx: Long,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Matches the batch gaps-and-islands semantics exactly: gap measured on
    * floor-second epochs (unix_timestamp ≡ Instant.getEpochSecond), first
    * session has idx 0, sum rounded with the Det formula. */
  private def foldSessions(userId: Long, events: Iterator[Event]): Iterator[SessionOut] = {
    val sorted = events.toArray.sortBy(e => (e.ts.toInstant, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[SessionOut]
      var idx = 0L
      var start = sorted.head.ts
      var end = sorted.head.ts
      var n = 0L
      var sum = 0.0
      def emit(): Unit =
        out += SessionOut(userId, idx, start, end, n,
          math.floor(sum * 100 + 0.5) / 100.0)
      sorted.foreach { e =>
        if (n > 0 &&
            e.ts.toInstant.getEpochSecond - end.toInstant.getEpochSecond > 1800) {
          emit(); idx += 1; start = e.ts; n = 0; sum = 0.0
        }
        end = e.ts; n += 1; sum += e.value
      }
      emit()
      out.result().iterator
    }
  }

  /** Typed sessionization over a Dataset[Event]; runs in batch or
    * streaming (NoTimeout — AvailableNow drains everything in one batch,
    * so each key is invoked once with its full history). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], _: GroupState[Long]) =>
          foldSessions(user, it)
      }
  }

  /** Query entry (oracle-exempt: custom stateful op; ScalaTest asserts
    * equality with the declarative stream_session_30m gaps-and-islands). */
  def streamStatefulSession(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sessionize(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** The same sessionization through `transformWithState` — Spark 4.x's
    * arbitrary-stateful-processing API (successor to
    * flatMapGroupsWithState): explicit `StatefulProcessor` lifecycle with
    * named state variables from the handle. State here is one Long per
    * user (running session count) — constant-size, the shape the RocksDB
    * state store scales with active keys, not history. Semantics are
    * identical to [[sessionize]]; the parity test pins both against the
    * declarative gaps-and-islands form. */
  class SessionProcessor extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var nSessions: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nSessions = getHandle.getValueState[Long](
        "nSessions", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val prior = if (nSessions.exists()) nSessions.get() else 0L
      val out = foldSessions(key, rows).toArray
        .map(so => so.copy(session_idx = so.session_idx + prior))
      nSessions.update(prior + out.length)
      out.iterator
    }
  }

  def sessionizeTws(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // transformWithState keeps each named state variable in its own column
    // family — supported by the RocksDB provider only (the default
    // HDFS-backed store rejects it). RocksDB is also the store you run at
    // scale: state spills to local disk instead of executor heap.
    events.sparkSession.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // batch execution needs the coordinator endpoint a stream would create
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(events.sparkSession)
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Query entry for the transformWithState path (oracle-exempt; parity
    * with streamStatefulSession asserted in ScalaTest). */
  def streamStatefulTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sessionizeTws(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"), col("session_idx"))
  }
}
