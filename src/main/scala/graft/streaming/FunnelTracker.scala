package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the batch `conversion_funnel` query: a per-user
  * state machine over `flatMapGroupsWithState` that tracks the ORDERED
  * view → click → purchase progression and emits exactly one completion
  * row the moment the funnel closes — instead of re-scanning the corpus
  * per report.
  *
  * Order sensitivity matches the batch query: a click counts only
  * strictly after the first view, a purchase only strictly after the
  * first qualifying click (events are processed in event-time order
  * within each batch; with watermark-ordered delivery the incremental
  * update equals the batch semantics).
  *
  * Scale: state is three timestamps per live user, sharded by the
  * groupBy key hash; completed users collapse to a `done` tombstone (so
  * repeat funnels never re-emit — the batch twin's each-user-counts-once
  * rule), users who produce no trackable progress allocate no state at
  * all, and the event-time timeout reaps both tombstones and idle
  * partials — no unbounded state.
  */
object FunnelTracker {

  case class FunnelEv(user_id: Long, event_type: String, ts: Timestamp)
  case class FunnelState(tView: Option[Long], tClick: Option[Long],
      done: Boolean = false)
  case class FunnelHit(user_id: Long, t_view: Timestamp, t_click: Timestamp,
      t_purchase: Timestamp)

  /** @param idleTimeoutMs reap state for users inactive this long past
    *                      the watermark without completing the funnel */
  def track(spark: SparkSession, events: Dataset[FunnelEv],
      idleTimeoutMs: Long = 24L * 3600 * 1000): Dataset[FunnelHit] = {
    import spark.implicits._

    def fn(userId: Long, evs: Iterator[FunnelEv],
        state: GroupState[FunnelState]): Iterator[FunnelHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val existed = state.exists
      val init = state.getOption.getOrElse(FunnelState(None, None))
      var s = init
      var hit: Option[FunnelHit] = None
      var lastMs = 0L
      evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        lastMs = math.max(lastMs, t)
        if (!s.done && hit.isEmpty) e.event_type match {
          case "view" if s.tView.isEmpty => s = s.copy(tView = Some(t))
          case "click" if s.tClick.isEmpty && s.tView.exists(t > _) =>
            s = s.copy(tClick = Some(t))
          case "purchase" if s.tClick.exists(t > _) =>
            hit = Some(FunnelHit(userId,
              new Timestamp(s.tView.get), new Timestamp(s.tClick.get),
              new Timestamp(t)))
          case _ => ()
        }
      }
      if (hit.isDefined) {
        // tombstone, not remove: matches the batch twin's each-user-counts-
        // ONCE semantics — a repeat view→click→purchase sequence must not
        // re-emit. The timeout still reaps the tombstone, so state stays
        // bounded by ACTIVE users, with a documented at-most-once-per-
        // timeout-window repeat guarantee after reaping.
        state.update(FunnelState(None, None, done = true))
        state.setTimeoutTimestamp(lastMs + idleTimeoutMs)
      } else if (existed || s != init) {
        // no-progress guard: a stray click/purchase with no prior view
        // must NOT allocate a state entry for an otherwise-unknown user
        state.update(s)
        state.setTimeoutTimestamp(lastMs + idleTimeoutMs)
      }
      hit.iterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
