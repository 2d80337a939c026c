package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing on Spark 4's `transformWithState` API —
  * the successor to flatMapGroupsWithState (compare
  * [[StatefulSessions]], which uses the classic API): typed per-key
  * state handles, timers, TTL, and RocksDB-backed state.
  *
  * This processor tracks the running peak reading per station — the
  * "all-time high" monitor the reference's windowed aggregates cannot
  * express (windows forget; this state spans the stream's lifetime).
  * State is one double per key, sharded by grouping key across
  * executors; TTL (none here) is the knob that bounds it for unbounded
  * key spaces at 100 TB.
  */
class PeakTracker extends StatefulProcessor[String, (String, Double), (String, Double, Boolean)] {

  @transient private var peak: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    peak = getHandle.getValueState[Double]("peak", Encoders.scalaDouble, TTLConfig.NONE)

  /** Emits (station, peak, isNewPeak) once per key per micro-batch. */
  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Double)],
      timerValues: TimerValues): Iterator[(String, Double, Boolean)] = {
    val batchMax = rows.map(_._2).max
    val prior = if (peak.exists()) Some(peak.get()) else None
    val isNew = prior.forall(batchMax > _)
    val next = prior.fold(batchMax)(math.max(_, batchMax))
    peak.update(next)
    Iterator.single((key, next, isNew))
  }
}
