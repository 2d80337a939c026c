package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One raw event on the sessionization stream. `ts` is the event-time
  * column the watermark is declared on. */
case class SessIn(userId: Long, ts: Timestamp)

/** One CLOSED session — same shape as the batch `user_sessions` rows:
  * end = last event + gap (the `session_window` convention). */
case class SessOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

/** Sessionization on the Spark-4 arbitrary-state API with EVENT-TIME
  * TIMERS — the state-API leg the other trackers don't exercise:
  * ValueState ([[CusumTracker]]), ListState ([[HistogramTracker]]) hold
  * data; timers are the third primitive, the one that lets a key emit
  * WITHOUT receiving another row. Sessions close two ways, and both
  * paths emit here:
  *
  *  - a new event from the same user arrives ≥ gap after the session's
  *    last event — the old session is provably over, emitted inline in
  *    `handleInputRows`;
  *  - the event-time watermark passes last + gap — no in-gap event can
  *    ever arrive now, so the registered timer fires and
  *    `handleExpiredTimer` emits the trailing session. Without timers a
  *    user who walks away mid-session would hold state forever and
  *    never be reported (the abandoned-key leak `StatefulSessions`
  *    solves with the legacy GroupStateTimeout — this is the
  *    transformWithState replacement).
  *
  * Timer discipline: exactly ONE live timer per key — each batch
  * deletes the stale registration and re-arms at the extended session
  * end; the expiry guard in `handleExpiredTimer` drops a racing stale
  * timer rather than closing a session that a newer event has already
  * extended. Semantics match `session_window(ts, gap)` / the batch
  * `user_sessions` oracle: a session is a maximal run with consecutive
  * gaps < gap, end = last + gap (`TimerSessionSpec` proves set
  * equality against the DuckDB-oracled batch query). State is one
  * (start, last, n) triple + one timer per live key — key cardinality
  * is the only memory bound. */
class TimerSessionTracker(gapMs: Long)
  extends StatefulProcessor[Long, SessIn, SessOut] {

  // (startMs, lastMs, nEvents) of the key's open session
  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)](
      "session",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[SessIn],
      timerValues: TimerValues): Iterator[SessOut] = {
    var cur: Option[(Long, Long, Long)] =
      if (st.exists()) Some(st.get()) else None
    val prevEnd = cur.map(_._2 + gapMs)
    val out = Seq.newBuilder[SessOut]
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some((s, l, n)) if t < l + gapMs =>
          cur = Some((s, math.max(l, t), n + 1))
        case Some((s, l, n)) =>
          out += SessOut(key, s, l + gapMs, n)
          cur = Some((t, t, 1L))
        case None =>
          cur = Some((t, t, 1L))
      }
    }
    cur.foreach { case c @ (_, l, _) =>
      st.update(c)
      // re-arm: one live timer per key, at the (possibly extended) end
      val end = l + gapMs
      if (!prevEnd.contains(end)) {
        prevEnd.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(end)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] =
    if (!st.exists()) Iterator.empty
    else {
      val (s, l, n) = st.get()
      // a stale timer (session extended after registration) must not
      // close the live session early
      if (expiredTimerInfo.getExpiryTimeInMs >= l + gapMs) {
        st.clear()
        Iterator.single(SessOut(key, s, l + gapMs, n))
      } else Iterator.empty
    }
}
