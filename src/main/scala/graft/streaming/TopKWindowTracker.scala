package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One validated reading routed to its tumbling window: key the stream
  * by `windowStartMs = floor(ts / windowMs) · windowMs` before
  * `transformWithState`. `valueNumeric` is None for malformed rows. */
case class TopKIn(
    windowStartMs: Long, ts: Timestamp,
    stationId: String, sensorId: String, valueNumeric: Option[Double])

/** One ranked row of a CLOSED window — the same five columns the batch
  * `top_sensors_per_window` query emits (window start as epoch ms). */
case class TopKOut(
    windowStartMs: Long, rk: Int,
    stationId: String, sensorId: String, avgValue: Double)

/** Streaming twin of the batch `top_sensors_per_window` monitoring
  * query (SURVEY §2.7): per tumbling window, the k sensors with the
  * highest average valid reading — completing the batch/stream symmetry
  * the other monitoring families (CUSUM, z-score, histogram, as-of,
  * sessions) already have.
  *
  * Top-k of AVERAGES cannot be kept as a bounded heap alone (an
  * average moves as readings arrive), so state per window is the
  * per-(station, sensor) running (sum, count) of valid readings — the
  * same partial-aggregate algebra the batch hash aggregate carries,
  * O(#live sensors) per window, never a buffer of the feed. The sum is
  * carried as an EXACT decimal (every double is an exact binary
  * rational; exact addition is associative), so the tracker's output
  * is independent of how a window's rows split across micro-batches —
  * a floating double sum would drift by accumulation order and could
  * flip a 6-dp rounding boundary between runs. At emission the exact
  * sum is correctly rounded to double and divided, mirroring the batch
  * avg's own double pipeline. The bounded-top-k step
  * (`TopKAggregator`'s ordering contract: score desc, then id asc)
  * runs once, at emission. One caveat follows from the two pipelines:
  * the streamed average divides a CORRECTLY-ROUNDED exact sum while the
  * batch avg accumulates doubles in partition order, so exactly AT a
  * 6-dp HALF_UP rounding boundary of the batch double sum the two can
  * legitimately differ by one ulp-at-6dp — equality with the batch
  * query holds away from such boundaries, and the equivalence specs
  * compare averages with a 1e-6 tolerance for that reason.
  *
  * Emission is append-mode finalization, via the same event-time-timer
  * discipline as [[TimerSessionTracker]]: one timer per window key at
  * `windowStart + windowMs`, armed when the window's state first
  * becomes non-empty; when the watermark passes window end, the timer
  * fires, ranks by rounded average (desc, station, sensor — exactly
  * the batch tie-break), emits rows 1..k and clears the window's
  * state. A window whose rows were all malformed never arms (the batch
  * query's `avg_value IS NOT NULL` filter drops it too). Late rows
  * beyond the watermark are filtered before the processor, so a closed
  * window can never re-emit — exactly-once per (window, rk).
  *
  * Scale note (100 TB): state is dimension-sized (windows in flight ×
  * live sensors), not data-sized. The raw feed keys by window, so one
  * window is one task; at production rates, pre-aggregate
  * (window, station, sensor) partial sums per micro-batch upstream and
  * feed the partials here — the fold is the same because (sum, n)
  * partials are associative. `TopKTrackerSpec` proves set equality
  * with the DuckDB-oracled batch query across scrambled micro-batches. */
class TopKWindowTracker(k: Int, windowMs: Long)
  extends StatefulProcessor[Long, TopKIn, TopKOut] {

  require(k > 0, s"k must be positive, got $k")
  require(windowMs > 0, s"windowMs must be positive, got $windowMs")

  // (stationId, sensorId) -> (EXACT decimal sum of valid values as a
  // plain string, count of valid values) — see the scaladoc on why the
  // sum is exact rather than a Double
  @transient private var st: MapState[(String, String), (String, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[(String, String), (String, Long)](
      "sums",
      Encoders.tuple(Encoders.STRING, Encoders.STRING),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[TopKIn],
      timerValues: TimerValues): Iterator[TopKOut] = {
    val wasEmpty = !st.iterator().hasNext
    rows.foreach { r =>
      r.valueNumeric.foreach { v =>
        val slot = (r.stationId, r.sensorId)
        val (s, n) =
          if (st.containsKey(slot)) st.getValue(slot) else ("0", 0L)
        // new BigDecimal(double) is the EXACT binary value; exact adds
        // commute, so any micro-batch split folds to the same sum
        val sum = new java.math.BigDecimal(s).add(new java.math.BigDecimal(v))
        st.updateValue(slot, (sum.toPlainString, n + 1))
      }
    }
    // arm once, on the empty→non-empty transition; all-malformed
    // windows never arm and so never emit (batch drops them too)
    if (wasEmpty && st.iterator().hasNext)
      getHandle.registerTimer(key + windowMs)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TopKOut] = {
    val entries = {
      val b = Vector.newBuilder[((String, String), (String, Long))]
      st.iterator().foreach(b += _)
      b.result()
    }
    st.clear()
    entries
      .map { case ((stn, sen), (s, n)) =>
        // correctly-rounded sum -> double division -> 6-dp HALF_UP:
        // the batch avg's own double pipeline, minus its accumulation-
        // order noise; ranked on the ROUNDED average like the batch
        val sumD = new java.math.BigDecimal(s).doubleValue
        val avg = BigDecimal(sumD / n)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        (stn, sen, avg)
      }
      .sortBy { case (stn, sen, avg) => (-avg, stn, sen) }
      .take(k)
      .zipWithIndex
      .iterator
      .map { case ((stn, sen, avg), i) => TopKOut(key, i + 1, stn, sen, avg) }
  }
}
