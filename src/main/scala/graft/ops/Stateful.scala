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

  /** One event's value in exact integer cents — the Det round applied
    * per event BEFORE summing, so session sums are integer additions and
    * accumulation order is provably irrelevant (same trick as
    * mv_incremental_refresh). For 2-dp inputs this equals the oracle's
    * floor(sum(value)*100+0.5)/100 exactly. */
  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  /** Matches the batch gaps-and-islands semantics exactly: gap measured on
    * floor-second epochs (unix_timestamp ≡ Instant.getEpochSecond), first
    * session has idx 0, sum folded in integer cents (see [[cents]]). */
  private def foldSessions(userId: Long, events: Iterator[Event]): Iterator[SessionOut] = {
    val sorted = events.toArray.sortBy(e => (e.ts.toInstant, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[SessionOut]
      var idx = 0L
      var start = sorted.head.ts
      var end = sorted.head.ts
      var n = 0L
      var sumCents = 0L
      def emit(): Unit =
        out += SessionOut(userId, idx, start, end, n, sumCents / 100.0)
      sorted.foreach { e =>
        if (n > 0 &&
            e.ts.toInstant.getEpochSecond - end.toInstant.getEpochSecond > 1800) {
          emit(); idx += 1; start = e.ts; n = 0; sumCents = 0L
        }
        end = e.ts; n += 1; sumCents += cents(e.value)
      }
      emit()
      out.result().iterator
    }
  }

  /** Typed sessionization over a Dataset[Event]; runs in batch or
    * single-batch streaming (NoTimeout — AvailableNow over one source file
    * drains everything in one batch, so each key is invoked once with its
    * full history).
    *
    * PRECONDITION (asserted): each key's full history arrives in ONE
    * micro-batch. A second invocation for the same key would silently
    * split a session spanning the batch boundary and restart session_idx,
    * so it throws instead — multi-batch streams belong to
    * [[sessionizeStream]], which carries open-session state and stitches
    * across batches. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[Boolean]) =>
          if (state.exists)
            throw new IllegalStateException(
              s"sessionize saw user $user in a second micro-batch; it " +
                "requires each key's full history in one batch — use " +
                "sessionizeStream for multi-batch streams")
          state.update(true)
          foldSessions(user, it)
      }
  }

  /** State carried across micro-batches by [[sessionizeStream]]:
    * `nextIdx` survives even after the open session is flushed by a
    * timeout, so a user who returns hours later continues the idx
    * sequence instead of reusing (user, 0). After a flush the state
    * shrinks to this counter (16 bytes/key); a production variant that
    * must evict idle keys entirely would key sessions by session_start
    * instead of a running index — unique without permanent state. */
  case class StreamState(nextIdx: Long, open: OpenSession)

  /** The open session's bounds and aggregates — constant size per key.
    * The sum is held in integer cents (see [[cents]]) so merge order
    * across micro-batches cannot perturb the 2-dp result. */
  case class OpenSession(
      idx: Long, startMicros: Long, endMicros: Long, n: Long, sumCents: Long)

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** INCREMENTAL sessionization — the multi-batch streaming form. State
    * holds the one open session per user; each batch merges its events
    * into it (stitching a session that spans micro-batches), emits every
    * session CLOSED by a >30 min gap, and registers an event-time timeout
    * at (session_end + 30 min) so the final session of a quiet user is
    * flushed by the watermark rather than held forever. Append-mode
    * correct: a session is emitted exactly once, when it can no longer
    * grow. State per key is one OpenSession — memory ∝ active users; the
    * watermark timeout evicts idle keys, which is what lets this run
    * indefinitely at scale. Input must carry withWatermark("ts", ...).
    *
    * Late events (legal under the watermark slack) are merged by running
    * gaps-and-islands over the sorted union of the batch's events AND the
    * open-session interval in one pass — so a chain of late events that
    * bridges transitively into the open session merges with it (round-4
    * ADVICE: a pre/rest cut at open.start − gap missed that), while late
    * islands a full gap clear of everything emit as their own earlier
    * sessions, numbered as batch gaps-and-islands would number them. */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[StreamState]) =>
          if (state.hasTimedOut) {
            // watermark passed session_end + gap: no event can extend it.
            // Keep the idx counter — a returning user must continue the
            // sequence, not reuse (user, 0).
            val st = state.get
            val o = st.open
            state.update(StreamState(st.nextIdx, null))
            Iterator.single(SessionOut(user, o.idx, toTs(o.startMicros),
              toTs(o.endMicros), o.n, o.sumCents / 100.0))
          } else {
            val prior = state.getOption
            val priorOpen = prior.map(_.open).orNull
            // Single-pass gaps-and-islands over the sorted UNION of this
            // batch's events and the open-session interval (the open
            // session participates as one mergeable island, ordered by its
            // start). This is exactly the batch semantics restricted to
            // what this key has ever seen minus already-emitted sessions —
            // in particular a chain of late events can bridge TRANSITIVELY
            // into the open session (e.g. gap=30m, open at 12:00, batch
            // delivers 11:10 and 11:35: 11:10→11:35→12:00 are each ≤30m
            // apart, so all three merge — the round-4 pre/rest cut at
            // open.start − gap wrongly islanded {11:10} alone because it
            // compared against the ORIGINAL open start). (start, end, n,
            // sum) spans; events are 1-point spans in (ts, event_id) order,
            // the open interval sorts by its startMicros ahead of any
            // event at the same instant.
            val spans: Array[OpenSession] = {
              val ev = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
                .map(e => OpenSession(0L, micros(e.ts), micros(e.ts), 1L,
                  cents(e.value)))
              if (priorOpen == null) ev
              else {
                val at = ev.indexWhere(_.startMicros >= priorOpen.startMicros)
                val i = if (at < 0) ev.length else at
                (ev.take(i) :+ priorOpen) ++ ev.drop(i)
              }
            }
            val closed = Seq.newBuilder[SessionOut]
            // Sessions already emitted keep their idx; everything still
            // mutable renumbers densely from the open session's idx (or
            // from nextIdx if no session is open), in time order — matching
            // how batch gaps-and-islands would number them. Islands before
            // the final one are emitted NOW even though the watermark
            // hasn't formally sealed them: cross-batch bridging through an
            // already-emitted session remains unfixable in append mode (a
            // later batch may legally deliver an event that would have
            // bridged into a session we already emitted) — documented
            // limitation, same as round 3/4.
            var base = if (priorOpen != null) priorOpen.idx
                       else prior.map(_.nextIdx).getOrElse(0L)
            var open: OpenSession = null
            spans.foreach { sp =>
              if (open == null)
                open = sp.copy(idx = base)
              // gap on floor-second epochs — EXACTLY foldSessions' measure
              // (micros would split e.g. end 10:00:00.9 → next 10:30:00.2,
              // which batch merges; ADVICE round-5)
              else if (sp.startMicros / 1000000L -
                         open.endMicros / 1000000L > 1800L) {
                closed += SessionOut(user, open.idx, toTs(open.startMicros),
                  toTs(open.endMicros), open.n, open.sumCents / 100.0)
                base += 1
                open = sp.copy(idx = base)
              } else
                open = open.copy(
                  endMicros = math.max(open.endMicros, sp.endMicros),
                  n = open.n + sp.n, sumCents = open.sumCents + sp.sumCents)
            }
            if (open != null) {
              state.update(StreamState(base + 1, open))
              // flush when the watermark proves the gap can't be beaten:
              // under the floor-second gap, events through endSec+1800
              // with ANY sub-second fraction (< endSec+1801) still merge.
              state.setTimeoutTimestamp(
                (open.endMicros / 1000000L + 1801L) * 1000L)
            }
            closed.result().iterator
          }
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

  /** Per-event anomaly verdict from the events BEFORE it (never itself —
    * a self-including z-score dilutes the very outlier it should flag). */
  case class AnomalyOut(
      event_id: Long, user_id: Long, n_prior: Long, z: Double,
      is_anomaly: Boolean)

  /** Constant-size per-key running moments (Welford: count, mean, M2) —
    * 24 bytes per user in the state store, independent of history length;
    * the shape that lets a feed score EVERY arriving event against its
    * user's full past at 100 TB without retaining any of that past. */
  case class WelfordState(n: Long, mean: Double, m2: Double)

  /** Same deterministic 4-dp rule as graft.Det.round, in JVM scalar form. */
  private def r4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** The shared scoring fold: sort the chunk by (ts, event_id), score each
    * event against the PRIOR moments (z vs population σ of the prefix;
    * needs ≥ 8 priors and σ > 0), then Welford-update. Identical bits
    * whether the chunk is a whole history (batch) or one micro-batch
    * resumed from carried state (stream) — which is what makes the
    * stream-batch parity test exact rather than approximate. */
  private[graft] def scoreFold(
      user: Long, evs: Array[Event], st: WelfordState)
      : (Array[AnomalyOut], WelfordState) = {
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    var n = st.n; var mean = st.mean; var m2 = st.m2
    val out = sorted.map { e =>
      val o =
        if (n >= 8 && m2 > 0.0) {
          val z = (e.value - mean) / math.sqrt(m2 / n)
          AnomalyOut(e.event_id, user, n, r4d(z), math.abs(z) > 3.0)
        } else AnomalyOut(e.event_id, user, n, 0.0, is_anomaly = false)
      n += 1
      val delta = e.value - mean
      mean += delta / n
      m2 += delta * (e.value - mean)
      o
    }
    (out, WelfordState(n, mean, m2))
  }

  /** Batch form: one shuffle on user_id, per-user sorted fold. */
  def anomalyWelford(events: Dataset[Event]): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups {
      (u: Long, it: Iterator[Event]) =>
        scoreFold(u, it.toArray, WelfordState(0L, 0.0, 0.0))._1.iterator
    }
  }

  /** INCREMENTAL form: the moments live in the state store and each
    * micro-batch resumes the fold exactly where the last one stopped.
    * Precondition (Kinesis per-shard ordering, shard key = user): a
    * user's events arrive in ts order ACROSS batches; within a batch any
    * order is fine (the fold sorts its chunk). State never times out —
    * three numbers per user is the cheapest state this engine holds, and
    * an idle user's moments are exactly what makes their return
    * scoreable; a deployment that must bound keys adds a TTL here. */
  def anomalyWelfordStream(events: Dataset[Event]): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], state: GroupState[WelfordState]) =>
          val (out, st2) = scoreFold(u, it.toArray,
            state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0)))
          state.update(st2)
          out.iterator
      }
  }

  /** Query entry (oracle-exempt: Welford's incremental moments are not
    * SQL-window-reproducible bit-for-bit; Round8Spec pins multi-batch
    * stream == batch and an injected-outlier verdict). */
  def streamAnomalyWelford(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    anomalyWelford(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Holt level+trend carried in the state store — ts_holt_linear's
    * recurrence lifted to the arriving-data shape: 3 values per user
    * (n, level, trend), each micro-batch folds its chunk in (ts,
    * event_id) order and emits the user's refreshed one-step forecast.
    * Update-mode semantics: downstream reads the LATEST row per user. */
  case class HoltState(n: Long, l: Double, b: Double)
  case class HoltOut(
      user_id: Long, n_obs: Long, level: Double, trend: Double,
      forecast_next: Double)

  private[graft] def holtFold(evs: Array[Event], st: HoltState): HoltState = {
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    var n = st.n; var l = st.l; var b = st.b
    sorted.foreach { e =>
      if (n == 0L) { l = e.value; b = 0.0 }
      else {
        val l2 = 0.5 * e.value + 0.5 * (l + b)
        b = 0.25 * (l2 - l) + 0.75 * b
        l = l2
      }
      n += 1
    }
    HoltState(n, l, b)
  }

  private def holtOut(u: Long, st: HoltState): HoltOut =
    HoltOut(u, st.n, r4d(st.l), r4d(st.b), r4d(st.l + st.b))

  /** Works in batch mode too (state starts empty, one chunk = the whole
    * history), which is what the query entry runs — the STREAMING form
    * resuming mid-series is what Round8Spec pins against ts_holt_linear. */
  def holtStream(events: Dataset[Event]): Dataset[HoltOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], state: GroupState[HoltState]) =>
          val st = holtFold(it.toArray,
            state.getOption.getOrElse(HoltState(0L, 0.0, 0.0)))
          state.update(st)
          Iterator.single(holtOut(u, st))
      }
  }

  /** Query entry (oracle-exempt; the batch-mode run of the stateful
    * operator must equal ts_holt_linear bit-for-bit — same fold — and
    * the multi-batch streaming run is pinned in Round8Spec). */
  def streamHoltForecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    holtStream(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"))
  }

  /** [[graft.ops.Quant.tsKalman1d]]'s local-level Kalman recurrence
    * lifted to the arriving-data shape: 3 values per user (n, x̂, P) in
    * the state store, each micro-batch folds its chunk in (ts,
    * event_id) order and emits the user's refreshed estimate +
    * error variance. Update-mode semantics: downstream reads the
    * LATEST row per user. Same cross-batch ordering precondition as
    * the Welford/Holt folds (Kinesis per-shard ordering, shard key =
    * user); within a batch the fold sorts its chunk. */
  case class KalmanState(n: Long, x: Double, p: Double)
  case class KalmanOut(
      user_id: Long, n_obs: Long, estimate: Double, err_var: Double)

  private[graft] def kalmanFold(
      evs: Array[Event], st: KalmanState): KalmanState = {
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    var n = st.n; var x = st.x; var p = st.p
    sorted.foreach { e =>
      if (n == 0L) { x = e.value; p = 1.0 }
      else {
        val pp = p + 0.25
        val k = pp / (pp + 1.0)
        x = x + k * (e.value - x)
        p = (1.0 - k) * pp
      }
      n += 1
    }
    KalmanState(n, x, p)
  }

  private def kalmanOut(u: Long, st: KalmanState): KalmanOut =
    KalmanOut(u, st.n, r4d(st.x), r4d(st.p))

  /** Works in batch mode too (state starts empty, one chunk = the whole
    * history) — the query entry; Round12Spec pins batch-mode equality
    * with ts_kalman_1d bit-for-bit plus split-fold resume parity (the
    * state is a sufficient statistic: folding any prefix, then the
    * rest from the stored state, equals one fold). */
  def kalmanStream(events: Dataset[Event]): Dataset[KalmanOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], state: GroupState[KalmanState]) =>
          val st = kalmanFold(it.toArray,
            state.getOption.getOrElse(KalmanState(0L, 0.0, 0.0)))
          state.update(st)
          Iterator.single(kalmanOut(u, st))
      }
  }

  /** Query entry (oracle-exempt; the batch-mode run of the stateful
    * operator must equal ts_kalman_1d's output bit-for-bit). */
  def streamKalmanFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    kalmanStream(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"))
  }

  /** [[graft.ops.Quant.tsHoltWinters]]'s triple-smoothing recurrence
    * lifted to the arriving-data shape — the stateful twin completing the
    * smoothing-ladder pairing (EWMA→…→Kalman each have one; this is the
    * Holt–Winters rung). State per user is O(1): (n closed days, level,
    * trend, the 7 Monday-based seasonal slots as explicit doubles — case
    * class equality stays structural — plus the OPEN day's epoch-day /
    * weekday / exact running cent sum). A day CLOSES only when a later
    * day's event arrives, so the daily cent sum is complete before it
    * enters the recurrence no matter where micro-batch boundaries fall;
    * the emission folds the still-open day into a COPY of the state, so
    * the update-mode readout equals the batch fold over everything seen
    * while resume stays exact (the stored state never double-counts).
    * Cross-batch per-user event-time ordering is the same precondition as
    * the Welford/Holt/Kalman folds (Kinesis per-shard ordering, shard key
    * = user); a violation that would silently corrupt a closed day
    * THROWS instead. Within a batch the fold sorts its chunk. */
  case class HwState(
      nDays: Long, l: Double, b: Double,
      s0: Double, s1: Double, s2: Double, s3: Double,
      s4: Double, s5: Double, s6: Double,
      openDay: Long, openWd: Int, openCents: Long)

  case class HwOut(
      user_id: Long, n_days: Long, level: Double, trend: Double,
      season_next: Double, forecast_next: Double)

  private[graft] val hwEmpty =
    HwState(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
      Long.MinValue, 0, 0L)

  /** Monday-based weekday of an epoch day (1970-01-01 was a Thursday,
    * Monday-based index 3) — matches Spark's `weekday` on the UTC date. */
  private def epochDayWd(day: Long): Int = Math.floorMod(day + 3L, 7L).toInt

  private[graft] def hwFold(evs: Array[Event], st: HwState): HwState = {
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    var nDays = st.nDays; var l = st.l; var b = st.b
    val sa = Array(st.s0, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6)
    var openDay = st.openDay; var openWd = st.openWd
    var openCents = st.openCents
    def closeOpenDay(): Unit = {
      val v = openCents.toDouble / 100.0
      if (nDays == 0L) { l = v; b = 0.0 }
      else {
        val sc = sa(openWd)
        val l2 = 0.5 * (v - sc) + 0.5 * (l + b)
        b = 0.25 * (l2 - l) + 0.75 * b
        sa(openWd) = 0.25 * (v - l2) + 0.75 * sc
        l = l2
      }
      nDays += 1
    }
    sorted.foreach { e =>
      val day = Math.floorDiv(micros(e.ts), 86400000000L)
      val c = math.floor(e.value * 100 + 0.5).toLong
      if (openDay == Long.MinValue) {
        openDay = day; openWd = epochDayWd(day); openCents = c
      } else if (day == openDay) openCents += c
      else if (day > openDay) {
        closeOpenDay()
        openDay = day; openWd = epochDayWd(day); openCents = c
      } else throw new IllegalStateException(
        s"hwFold: event day $day precedes the open day $openDay — " +
          "cross-batch per-user ordering precondition violated")
    }
    HwState(nDays, l, b, sa(0), sa(1), sa(2), sa(3), sa(4), sa(5), sa(6),
      openDay, openWd, openCents)
  }

  /** Provisional readout: closes the open day on LOCALS (the stored
    * state is untouched, so resume never double-folds a day). Equals the
    * batch fold over all days seen so far, last daily row = the open
    * day — hence bit-equality with [[graft.ops.Quant.tsHoltWinters]]. */
  private def hwOut(u: Long, st: HwState): HwOut = {
    var l = st.l; var b = st.b
    val sa = Array(st.s0, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6)
    val v = st.openCents.toDouble / 100.0
    if (st.nDays == 0L) { l = v; b = 0.0 }
    else {
      val sc = sa(st.openWd)
      val l2 = 0.5 * (v - sc) + 0.5 * (l + b)
      b = 0.25 * (l2 - l) + 0.75 * b
      sa(st.openWd) = 0.25 * (v - l2) + 0.75 * sc
      l = l2
    }
    val sNext = sa((st.openWd + 1) % 7)
    HwOut(u, st.nDays + 1L, r4d(l), r4d(b), r4d(sNext), r4d(l + b + sNext))
  }

  /** Works in batch mode too (state starts empty, one chunk = the whole
    * history) — the query entry, which therefore shares ts_holt_winters'
    * DuckDB recursive-CTE oracle verbatim; the multi-batch resume and
    * mid-day/day-boundary split parity are pinned in Round13Spec. */
  def hwStream(events: Dataset[Event]): Dataset[HwOut] = {
    import events.sparkSession.implicits._
    // hwFold buckets days via floorDiv(epoch-micros, 1 day) = UTC days,
    // while the batch twin (Quant.tsHoltWinters) and the shared DuckDB
    // oracle bucket via CAST(ts AS DATE) in the SESSION timezone. The
    // bit-equality pin is only sound when the two agree, i.e. the session
    // runs UTC (Bench/Verify/all specs pin it); fail loudly rather than
    // silently re-bucketing days in a non-UTC session (ADVICE r13).
    val tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
      s"hwStream requires spark.sql.session.timeZone=UTC (found '$tz'): " +
        "its epoch-day bucketing matches the batch/oracle CAST(ts AS DATE) " +
        "only in UTC")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], state: GroupState[HwState]) =>
          val st = hwFold(it.toArray, state.getOption.getOrElse(hwEmpty))
          state.update(st)
          Iterator.single(hwOut(u, st))
      }
  }

  /** Query entry — oracle-GATED: batch mode must hash-match the same
    * recursive-CTE twin as ts_holt_winters (identical columns, rounding,
    * order), the strongest possible pin for a stateful operator. */
  def streamHoltWinters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    hwStream(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"))
  }

  /** [[graft.ops.Analytics.cdcScd2]]'s type-2 history lifted to the
    * arriving-data shape — how a feature store actually MAINTAINS a
    * slowly-changing dimension under a change stream instead of
    * recomputing the lead() window over all history: state per user is
    * the one OPEN version (event_id, type, valid_from); each arriving
    * event closes it (valid_to = the new event's ts, is_current 0) and
    * opens its own. The open row is emitted provisionally with
    * is_current 1 and re-emitted CLOSED when superseded — update-mode
    * semantics, downstream reads the latest row per (user, event_id),
    * exactly the contract the closed history never violates (closed
    * rows are immutable). Cross-batch per-user event-time ordering is
    * the shared fold precondition (Kinesis per-shard ordering); a
    * regressed event would corrupt an immutable closed row, so it
    * THROWS. Within a batch the fold sorts its chunk. */
  case class Scd2State(eventId: Long, eventType: String, validFrom: Timestamp)

  case class Scd2Out(
      user_id: Long, event_id: Long, event_type: String,
      valid_from: Timestamp, valid_to: Option[Timestamp], is_current: Int)

  /** Returns (emissions for this chunk, new open-row state). Emissions =
    * every version closed by this chunk + the provisional open row. */
  private[graft] def scd2Fold(
      u: Long, evs: Array[Event], st: Option[Scd2State])
      : (Seq[Scd2Out], Scd2State) = {
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    val out = Seq.newBuilder[Scd2Out]
    var open = st
    sorted.foreach { e =>
      open.foreach { o =>
        // full (ts, event_id) tuple — mirrors the intra-chunk sort key, so
        // a same-timestamp event with a SMALLER id (which the batch lead()
        // form would order BEFORE the open version) also trips the guard
        // instead of silently appending a divergent version (ADVICE r13)
        if (micros(e.ts) < micros(o.validFrom) ||
            (micros(e.ts) == micros(o.validFrom) && e.event_id < o.eventId))
          throw new IllegalStateException(
            s"scd2Fold: event ${e.event_id} at ${e.ts} precedes user $u's " +
              s"open version (${o.eventId} from ${o.validFrom}) — ordering " +
              "precondition violated; a closed row is immutable")
        out += Scd2Out(u, o.eventId, o.eventType, o.validFrom,
          Some(e.ts), 0)
      }
      open = Some(Scd2State(e.event_id, e.event_type, e.ts))
    }
    val o = open.get
    out += Scd2Out(u, o.eventId, o.eventType, o.validFrom, None, 1)
    (out.result(), o)
  }

  /** Works in batch mode too (state starts empty, one chunk = all
    * history ⇒ emissions are exactly cdc_scd2's rows) — the query entry,
    * which therefore shares cdc_scd2's lead()-window oracle verbatim;
    * split-resume parity is pinned in Round13Spec. */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], state: GroupState[Scd2State]) =>
          val (out, st) = scd2Fold(u, it.toArray, state.getOption)
          state.update(st)
          out.iterator
      }
  }

  /** Query entry — oracle-GATED via cdc_scd2's SQL twin (batch mode
    * emits each event_id exactly once, bit-identical to the lead()
    * window form). */
  def streamScd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    scd2Stream(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
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
    // (last emitted session_end micros, next session_idx): continues the
    // idx sequence across micro-batches AND detects the one case this
    // Append-mode processor cannot express — a session spanning two
    // batches, whose first emission would need retraction. That case
    // throws (documented precondition) instead of silently splitting;
    // [[sessionizeStream]] is the stitching form.
    @transient private var lastState: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastState = getHandle.getValueState[(Long, Long)](
        "lastEndNextIdx", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val (lastEnd, base) =
        if (lastState.exists()) lastState.get() else (Long.MinValue, 0L)
      val out = foldSessions(key, rows).toArray
        .map(so => so.copy(session_idx = so.session_idx + base))
      out.headOption.foreach { first =>
        if (lastEnd != Long.MinValue &&
            micros(first.session_start) / 1000000L -
              lastEnd / 1000000L <= 1800L)
          throw new IllegalStateException(
            s"SessionProcessor: user $key session spans micro-batches " +
              "(first event within 30 min of the prior batch's last); " +
              "Append mode cannot retract — use sessionizeStream")
      }
      out.lastOption.foreach { last =>
        lastState.update((micros(last.session_end), base + out.length))
      }
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

  /** [[graft.ops.Relational.sqlMergeUpsert]]'s MERGE view lifted to the
    * arriving-data shape — how a warehouse MAINTAINS a merge target
    * under a change stream instead of recomputing the two compactions
    * and the full-outer join over all history: state per (user, type)
    * key is the pair of latest-wins CANDIDATES (best even-id target
    * row, best odd-id source row by the (ts, event_id) total order);
    * each micro-batch folds its events into the candidates and emits
    * the key's CURRENT merge view — update-mode semantics, downstream
    * reads the latest row per key. Unlike the scd2/Holt folds this
    * fold is an ORDER-FREE max (candidate selection is a commutative
    * tuple-max), so it carries NO cross-batch ordering precondition —
    * late or reordered events converge to the same view.
    *
    * A key whose view transitions to DELETED after a live row was
    * published emits one `action='delete'` tombstone (carrying the
    * deleting source event's identity) so downstream latest-per-key
    * reads retract it; repeated deletes re-emit nothing. In BATCH mode
    * (one chunk = all history, nothing pre-published) tombstones never
    * fire and the emissions are exactly sqlMergeUpsert's rows — so the
    * key shares its DuckDB oracle verbatim, plus Round14Spec pins the
    * fold's order-freeness, split-replay equality, and the tombstone
    * protocol. */
  case class MuCand(evId: Long, ts: Timestamp, v: Double)
  case class MuState(t: Option[MuCand], s: Option[MuCand], emitted: Boolean)
  case class MuOut(user_id: Long, event_type: String, event_id: Long,
      ts: Timestamp, value: Double, action: String)

  private def muBetter(cur: Option[MuCand], e: Event): Option[MuCand] =
    cur match {
      case Some(c) if micros(c.ts) > micros(e.ts) ||
          (micros(c.ts) == micros(e.ts) && c.evId >= e.event_id) => cur
      case _ => Some(MuCand(e.event_id, e.ts, e.value))
    }

  private[graft] def muFold(evs: Array[Event], st: MuState): MuState = {
    var t = st.t
    var s = st.s
    evs.foreach { e =>
      if (e.event_id % 2 == 0) t = muBetter(t, e) else s = muBetter(s, e)
    }
    MuState(t, s, st.emitted)
  }

  private def r2c(v: Double): Double = math.floor(v * 100 + 0.5) / 100.0

  /** Current MERGE view of one key; None ⇔ the key is deleted/absent. */
  private[graft] def muView(
      u: Long, et: String, st: MuState): Option[MuOut] =
    st.s match {
      case None => st.t.map(c => MuOut(u, et, c.evId, c.ts, r2c(c.v), "keep"))
      case Some(c) if c.evId % 5 == 0 => None
      case Some(c) =>
        Some(MuOut(u, et, c.evId, c.ts, r2c(c.v),
          if (st.t.isDefined) "update" else "insert"))
    }

  def muStream(events: Dataset[Event]): Dataset[MuOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: (Long, String), it: Iterator[Event], state: GroupState[MuState]) =>
          val st = muFold(it.toArray,
            state.getOption.getOrElse(MuState(None, None, emitted = false)))
          val view = muView(k._1, k._2, st)
          val out: Seq[MuOut] = view match {
            case Some(row) => Seq(row)
            case None if st.emitted =>
              st.s.map(c =>
                MuOut(k._1, k._2, c.evId, c.ts, r2c(c.v), "delete")).toSeq
            case None => Seq.empty
          }
          state.update(st.copy(emitted = view.isDefined))
          out.iterator
      }
  }

  /** Query key entry — oracle-GATED: batch mode emits exactly
    * sqlMergeUpsert's rows, sharing its SQL twin verbatim. */
  def streamMergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    muStream(Tables.events(s, d).as[Event])
      .toDF()
      .orderBy(col("user_id"), col("event_type"))
  }
}
