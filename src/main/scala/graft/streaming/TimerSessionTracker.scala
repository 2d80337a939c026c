package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

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
  * WITHOUT receiving another row.
  *
  * Sessions close in exactly ONE place: `handleExpiredTimer`, and only
  * once the event-time watermark has passed `last + gap` — the moment
  * "no in-gap event can ever arrive now" becomes provable. A
  * gap-crossing event does NOT close its predecessor inline: under the
  * watermark contract an in-gap event may still arrive in a LATER
  * micro-batch while above the watermark (gap 30 min, delay 10 min, an
  * event in the last 10 min of the gap), and the batch `session_window`
  * semantics would merge across it. So `handleInputRows` only FOLDS:
  * state is the list of still-mergeable open sessions, and each event
  * merges every session whose `[start, last+gap)` extent overlaps the
  * event's own `[t, t+gap)` window — including the bridge case where
  * one late event fuses two previously-separate sessions into one
  * (counts add). Emission order is append-safe because an emitted
  * session's end ≤ watermark, and any event that could still have
  * merged it would have to carry ts < end ≤ watermark — which the
  * late-record filter has already dropped.
  *
  * Timer discipline: exactly ONE live timer per key, armed at the
  * earliest pending session end. `handleInputRows` re-arms when a fold
  * moves that minimum; `handleExpiredTimer` closes every session whose
  * end the watermark has passed, keeps the rest, and re-arms at the new
  * minimum (the framework removes a fired timer itself). Semantics
  * match `session_window(ts, gap)` / the batch `user_sessions` oracle:
  * a session is a maximal run with consecutive gaps < gap, end =
  * last + gap (`TimerSessionSpec` proves set equality against the
  * DuckDB-oracled batch query, including a genuinely LATE above-
  * watermark in-gap event that must merge, not split). State is one
  * (start, last, n) triple per PENDING session — bounded by the
  * lateness horizon: a session older than the watermark delay always
  * closes at the next watermark advance, so at most
  * ~delay/gap + 1 sessions are ever buffered per key. */
class TimerSessionTracker(gapMs: Long)
  extends StatefulProcessor[Long, SessIn, SessOut] {

  // a zero/negative gap (e.g. a minutes-vs-ms unit slip) would make the
  // overlap predicate never merge and arm already-passed timers — fail
  // fast like the other trackers' constructor guards
  require(gapMs > 0, s"gapMs must be positive, got $gapMs")

  // (startMs, lastMs, nEvents) of every still-mergeable session
  @transient private var st: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getListState[(Long, Long, Long)](
      "sessions",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def pending(): Vector[(Long, Long, Long)] = {
    val b = Vector.newBuilder[(Long, Long, Long)]
    st.get().foreach(b += _)
    b.result()
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[SessIn],
      timerValues: TimerValues): Iterator[SessOut] = {
    var sessions = pending()
    val prevTimer = if (sessions.isEmpty) None
      else Some(sessions.map(_._2 + gapMs).min)
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      // a session is mergeable iff its [start, last+gap) extent overlaps
      // the event's [t, t+gap) window; one event may bridge several
      val (overlap, rest) =
        sessions.partition { case (s, l, _) => t < l + gapMs && t + gapMs > s }
      val merged =
        if (overlap.isEmpty) (t, t, 1L)
        else (math.min(overlap.map(_._1).min, t),
              math.max(overlap.map(_._2).max, t),
              overlap.map(_._3).sum + 1L)
      sessions = rest :+ merged
    }
    st.put(sessions.toArray)
    val newTimer = Some(sessions.map(_._2 + gapMs).min)
    if (newTimer != prevTimer) {
      prevTimer.foreach(getHandle.deleteTimer)
      newTimer.foreach(getHandle.registerTimer)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] = {
    val sessions = pending()
    if (sessions.isEmpty) { st.clear(); return Iterator.empty }
    // the watermark has passed the fired expiry; close everything it
    // has passed — no event above the watermark can merge those now
    val wm = math.max(timerValues.getCurrentWatermarkInMs(),
      expiredTimerInfo.getExpiryTimeInMs())
    val (closed, open) = sessions.partition { case (_, l, _) => l + gapMs <= wm }
    if (open.isEmpty) st.clear()
    else {
      st.put(open.toArray)
      // the fired timer is gone (framework-removed); re-arm at the
      // earliest remaining end
      getHandle.registerTimer(open.map(_._2 + gapMs).min)
    }
    closed.sortBy(_._1).iterator
      .map { case (s, l, n) => SessOut(key, s, l + gapMs, n) }
  }
}
