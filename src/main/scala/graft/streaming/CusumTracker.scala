package graft.streaming

import scala.math.BigDecimal.RoundingMode.HALF_UP

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch `sensor_cusum` query: two-sided tabular
  * CUSUM as per-key `transformWithState` state. Where the batch form
  * needs the closed-form rewrite (S_t = C_t − min(0, running-min C)) to
  * become window-expressible, the streaming form runs the textbook
  * recursion S_t = max(0, S_{t-1} + z_t) directly — CUSUM is the
  * anomaly detector that is NATURALLY incremental: state is exactly two
  * numbers per key, not a buffer (contrast `RollingZscoreTracker`'s ring
  * buffer), so key cardinality is the only memory bound.
  *
  * Reference parameters (μ, σ) per key are supplied at construction —
  * the standard Phase I / Phase II split of control-chart practice: the
  * baseline is estimated offline (the batch query's DECIMAL moment
  * pass), monitoring runs against it. Slack k = σ/2 and decision
  * threshold h = 4σ mirror the batch query.
  *
  * Exactness: the slack-adjusted deviation is rounded to 6 dp and
  * carried in integer MICRO-UNITS (a Long), so the recursion is exact
  * integer arithmetic — no float drift across micro-batches, and the
  * emitted values equal the batch query's rounded-DECIMAL closed form
  * bit-for-bit (`CusumEquivalenceSpec` asserts it on scrambled
  * micro-batches against the DuckDB-oracled batch output). Rows inside a
  * micro-batch fold in event-time order; keys without a configured
  * baseline emit nothing (monitoring an uncalibrated key is undefined).
  *
  * Ordering contract: CUSUM is a sequence recursion, so the bit-for-bit
  * batch claim requires CROSS-BATCH event-time order — a row older than
  * an already-folded one cannot be inserted retroactively with O(1)
  * state (the same inherent limit as [[AsofTracker]]'s carry). Within a
  * batch the sort restores any arrival order; across batches, feed the
  * tracker from a watermarked source so genuinely late rows are dropped
  * rather than folded out of order.
  *
  * Input: (key, eventTimeUs, value). Output:
  * (key, eventTimeUs, value, cusumPos, cusumNeg, isShift).
  */
class CusumTracker(params: Map[String, (Double, Double)])
  extends StatefulProcessor[String, (String, Long, Double), (String, Long, Double, Double, Double, Boolean)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)](
      "cusum", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  /** round(x, 6) of the slack-adjusted deviation, as exact 1e-6 units. */
  private def zMicro(dev: Double): Long =
    BigDecimal(dev).setScale(6, HALF_UP).underlying.movePointRight(6).longValueExact

  /** Exact 1e-6-unit value back to the nearest double — the same value
    * the batch query's cast-to-double of the exact DECIMAL produces. */
  private def toDouble(micro: Long): Double =
    BigDecimal(java.math.BigDecimal.valueOf(micro, 6)).toDouble

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double, Double, Double, Boolean)] =
    params.get(key) match {
      case None => Iterator.empty
      case Some((mu, sigma)) =>
        var (sp, sn) = if (st.exists()) st.get() else (0L, 0L)
        val out = rows.toSeq.sortBy(_._2).map { case (k, tsUs, x) =>
          sp = math.max(0L, sp + zMicro(x - mu - sigma * 0.5))
          sn = math.max(0L, sn + zMicro(mu - x - sigma * 0.5))
          val (spD, snD) = (toDouble(sp), toDouble(sn))
          (k, tsUs, x, spD, snD, spD > sigma * 4 || snD > sigma * 4)
        }
        st.update((sp, sn))
        out.iterator
    }
}
