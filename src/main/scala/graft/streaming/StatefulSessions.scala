package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state API the reference never needed but any monitoring
  * pipeline eventually does (per-key state machines beyond windowed aggs).
  *
  * Semantics match `session_window(ts, gap)`: a session is a maximal run
  * of per-user events where consecutive gaps are < `gap`; session_end =
  * last event + gap. Sessions are emitted when they close — either a new
  * event arrives beyond the gap, or the event-time watermark passes
  * last + gap (timeout).
  *
  * Scale: state is one small record per live (user, session); keys shard
  * across executors by groupBy hash, and the event-time timeout bounds
  * state lifetime — no unbounded growth on abandoned keys.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(startMs: Long, lastMs: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  def sessionize(spark: SparkSession, events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import spark.implicits._

    def close(userId: Long, s: SessionState): Session =
      Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs), s.n)

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed last + gap: final emission for this session
        // (the API guarantees evs is empty on timeout invocations)
        val out = state.getOption.map(close(userId, _))
        state.remove()
        return out.iterator
      }
      val sorted = evs.toSeq.sortBy(e => e.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs < gapMs =>
            cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case Some(s) =>
            closed ::= close(userId, s)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        case None => state.remove()
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
