package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch per-user accumulator state. */
case class UserAccum(n: Long, minUs: Long, maxUs: Long)

/** One emission per (user, micro-batch-with-input): the CUMULATIVE
  * profile as of that batch. */
case class UserProgress(user_id: Long, n_cum: Long, first_us: Long,
                        last_us: Long)

/** Arbitrary stateful processing through the `transformWithState` API
  * (the typed state-v2 surface: named state variables on a
  * multi-column-family RocksDB store, explicit TTL, timers) — the
  * successor to `flatMapGroupsWithState` that EventStream.closedSessions
  * drives. This processor keeps ONE `ValueState[UserAccum]` per user and
  * emits the cumulative (n, first, last) profile every micro-batch the
  * user appears in — the incremental "user profile store" topology: at
  * scale the same query maintains billions of profiles with per-key
  * point updates, no re-aggregation of history.
  *
  * Determinism: the fold is ORDER-INSENSITIVE (count/min/max), so the
  * arbitrary within-batch row order of `handleInputRows` cannot affect
  * output; batch membership is pinned by the staged two-file feed's
  * deterministic time split, making each emission's cumulative snapshot
  * closed-form (StreamingQueries.stTransformWithStateSql).
  */
class UserProgressProcessor
    extends StatefulProcessor[Long, (Long, Long), UserProgress] {

  @transient private var acc: ValueState[UserAccum] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[UserAccum]("acc",
      Encoders.product[UserAccum], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[UserProgress] = {
    var a =
      if (acc.exists()) acc.get()
      else UserAccum(0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, us) =>
      a = UserAccum(a.n + 1L, math.min(a.minUs, us), math.max(a.maxUs, us))
    }
    acc.update(a)
    Iterator.single(UserProgress(key, a.n, a.minUs, a.maxUs))
  }
}

/** Per-user timer state: event count + first-seen ms + the expiry of
  * the currently-registered milestone timer (Long.MinValue = none).
  *
  * STATE-FORMAT NOTE: r8 repurposed the third slot (registered: Boolean
  * → timerMs: Long), which is incompatible with any transformWithState
  * checkpoint written before that change — a restore would misread the
  * encoded state. All probes/specs here stage FRESH checkpoint dirs, so
  * nothing restores across the break; a deployment that keeps
  * checkpoints must instead ADD a field (append-compatible) or discard
  * checkpoints when the schema changes. */
case class TimerAccum(n: Long, firstMs: Long, timerMs: Long)

/** Milestone emission payload: the user's cumulative count at the
  * moment their event-time timer fired. */
case class UserMilestone(user_id: Long, timer_ms: Long, n_at_fire: Long)

/** The EVENT-TIME TIMER path of `transformWithState` — the half of the
  * state-v2 API [[UserProgressProcessor]] doesn't touch: each user
  * registers one timer at first-seen + `horizonMs`; when the watermark
  * passes it, `handleExpiredTimer` emits the count accumulated so far
  * and clears the state. Users whose horizon outlives the bounded
  * replay's final watermark correctly emit NOTHING — their state (and
  * timer) would keep waiting on an unbounded stream, exactly like the
  * withheld open sessions in EventStream.closedSessions. Input rows
  * themselves emit nothing: all output flows through the timer path,
  * so the oracle checks timer REGISTRATION, watermark-driven expiry,
  * and state readback at fire time in one closed form.
  */
class UserMilestoneProcessor(horizonMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
      UserMilestone] {

  @transient private var acc: ValueState[TimerAccum] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[TimerAccum]("acc",
      Encoders.product[TimerAccum], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timers: TimerValues): Iterator[UserMilestone] = {
    var a =
      if (acc.exists()) acc.get()
      else TimerAccum(0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, ts) =>
      a = a.copy(n = a.n + 1L, firstMs = math.min(a.firstMs, ts.getTime))
    }
    // The fire time tracks the GLOBAL min event time, so if an earlier
    // event arrives in a later micro-batch (legal within the watermark)
    // the stale timer is deleted and re-registered at the new horizon —
    // without this, a multi-batch feed would fire at the first batch's
    // local min and diverge from the oracle's MIN(ms) closed form.
    val fireAt = a.firstMs + horizonMs
    if (a.timerMs == Long.MinValue) {
      getHandle.registerTimer(fireAt)
      a = a.copy(timerMs = fireAt)
    } else if (fireAt < a.timerMs) {
      getHandle.deleteTimer(a.timerMs)
      getHandle.registerTimer(fireAt)
      a = a.copy(timerMs = fireAt)
    }
    acc.update(a)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[UserMilestone] = {
    val a = acc.get()
    acc.clear()
    Iterator.single(UserMilestone(key, expired.getExpiryTimeInMs, a.n))
  }
}
