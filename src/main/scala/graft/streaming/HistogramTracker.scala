package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of the batch `value_hist_quantiles` SKETCH path: the
  * per-key equi-width histogram as `transformWithState` state — the
  * mergeable quantile summary carried live. The batch query derives its
  * [min, max] from the data in a first scan; a stream cannot see the
  * future, so the bounds are pinned at deployment (the standard
  * operating contract for fixed-bin streaming histograms) and
  * out-of-range values clamp into the edge bins. On in-range data the
  * estimate arithmetic is the batch query's integer recipe verbatim —
  * bin = (v−vmin)·B div w, rank r = ⌈q·n/100⌉, linear in-bin
  * interpolation, all truncating Long division — so stream and batch
  * agree bit-for-bit (`HistogramEquivalenceSpec`).
  *
  * Emits the current p25/p50/p75/p90/p99 estimates after every
  * micro-batch: (key, n, q_pct, est_micro). State is `bins` longs per
  * key — constant at any scale, TTL-able; the fold is commutative, so
  * no within-batch ordering is needed (unlike the z-score tracker's
  * event-time replay). */
class HistogramTracker(vmin: Long, vmax: Long, bins: Int = 256)
  extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  // bin arithmetic is pure Long: (clamped − vmin) · bins and
  // (b + 1) · w must both fit, so an oversized deployment range fails
  // fast at construction instead of silently wrapping into wrong bins
  // (the batch query derives its bounds from data and shares the limit;
  // the tracker's bounds are free deployment parameters)
  require(bins > 0, s"bins must be positive, got $bins")
  require(vmax >= vmin, s"empty value range [$vmin, $vmax]")
  require((BigInt(vmax) - BigInt(vmin) + 1) * bins <= Long.MaxValue,
    s"[vmin=$vmin, vmax=$vmax] span overflows Long bin arithmetic for " +
      s"$bins bins (max span ${Long.MaxValue / bins})")

  private val w = vmax - vmin + 1

  @transient private var hist: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getListState[Long]("hist", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val h = {
      val g = hist.get().toArray
      if (g.isEmpty) new Array[Long](bins) else g
    }
    rows.foreach { case (_, v) =>
      val clamped = math.min(math.max(v, vmin), vmax)
      h((((clamped - vmin) * bins) / w).toInt) += 1L
    }
    hist.put(h)
    val n = h.sum
    if (n == 0L) Iterator.empty
    else Seq(25L, 50L, 75L, 90L, 99L).iterator.map { q =>
      val r = (n * q + 99L) / 100L
      var cum = 0L
      var b = 0
      while (cum + h(b) < r) { cum += h(b); b += 1 }
      val lo = vmin + b.toLong * w / bins
      val width = (b + 1).toLong * w / bins - b.toLong * w / bins
      val est = lo + (r - cum - 1L) * width / h(b)
      (key, n, q, est)
    }
  }
}
