package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch `sensor_ewma` query: the RECURSIVE
  * exponential smoother ewma′ = α·v + (1−α)·ewma as per-station
  * `transformWithState` state — one double per key, updated per event.
  * (The batch query is the truncated-window approximation of exactly
  * this recursion; a streaming engine keeps the true running state
  * instead, which is why the batch form truncates at 2^-8.)
  *
  * Rows inside a micro-batch are folded in event-time order (the
  * iterator's arrival order is not a contract), so replays produce
  * identical output; emits one row per input event with its smoothed
  * value — the real-time denoised feed. Ordering contract: the smoother
  * is a sequence recursion, so cross-batch event-time order is a
  * precondition (the [[AsofTracker]]-class O(1)-state limit) — feed from
  * a watermarked source so late rows drop instead of folding out of
  * order. State is one double per
  * station: bounded by key cardinality, TTL-able for unbounded key
  * spaces.
  */
class EwmaTracker(alpha: Double = 0.5)
  extends StatefulProcessor[String, (String, Long, Double), (String, Long, Double, Double)] {

  @transient private var ewma: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ewma = getHandle.getValueState[Double]("ewma", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double, Double)] = {
    var cur: Option[Double] = if (ewma.exists()) Some(ewma.get()) else None
    // tie-break equal timestamps by value: iterator arrival order is not
    // a contract, and an order-dependent fold would make replays diverge
    val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (st, ts, v) =>
      val next = cur.fold(v)(prev => alpha * v + (1 - alpha) * prev)
      cur = Some(next)
      (st, ts, v, next)
    }
    cur.foreach(ewma.update)
    out.iterator
  }
}
