package graft.streaming

import scala.math.BigDecimal.RoundingMode.HALF_UP

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of the batch `sensor_rolling_zscore` query: the causal
  * 10-reading z-score as per-key `transformWithState` state — a bounded
  * ring buffer of the last `window` values per (station, sensor), updated
  * per event. The batch query's window frame IS this state (ROWS 10
  * PRECEDING .. 1 PRECEDING); the streaming form carries it explicitly,
  * which is why the batch scaladoc calls the frame "the same bound a
  * streaming port would carry".
  *
  * Numeric discipline mirrors the batch/oracle convention EXACTLY
  * (decimal-scaled sums, two-moment variance, divisor stddev rounded to 6
  * before the ratio), so batch and stream agree bit-for-bit on the same
  * data — asserted by `RollingZscoreEquivalenceSpec` against the
  * DuckDB-oracled batch query, not just a hand fold.
  *
  * Rows inside a micro-batch are folded in (ts, eventId) order (iterator
  * arrival order is not a contract); state is ≤ `window` doubles per key,
  * bounded by key cardinality and TTL-able. Ordering contract: the ring
  * buffer is positional, so the bit-for-bit batch claim requires
  * CROSS-BATCH (ts, eventId) order — a late row would score against and
  * enter the buffer at the wrong position (the [[AsofTracker]]-class
  * O(w)-state limit); feed from a watermarked source so late rows drop
  * instead of folding out of order. Emits one row per input
  * event: (key, eventId, value, nPrior, zscoreOrNaN — NaN encodes
  * "unscored", Options don't survive the tuple encoder).
  */
class RollingZscoreTracker(window: Int = 10, minPrior: Int = 4)
  extends StatefulProcessor[String, (String, Long, Long, Double), (String, Long, Double, Long, Double)] {

  @transient private var buf: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[Double]("buf", Encoders.scalaDouble, TTLConfig.NONE)

  /** The shared scoring rule (also the reference recount in specs). */
  private def score(prior: Seq[Double], v: Double): Double = {
    val n = prior.length
    if (n < minPrior) Double.NaN
    else {
      val s1 = prior.map(x => BigDecimal(x).setScale(6, HALF_UP)).sum.toDouble
      val s2 = prior.map(x => BigDecimal(x * x).setScale(10, HALF_UP)).sum.toDouble
      val std = BigDecimal(math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0)))
        .setScale(6, HALF_UP).toDouble
      if (std > 0) BigDecimal((v - s1 / n) / std).setScale(6, HALF_UP).toDouble
      else Double.NaN
    }
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double, Long, Double)] = {
    var prior: Vector[Double] = buf.get().toVector
    // event-time order with eventId tiebreak: replay-stable fold
    val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (k, _, eventId, v) =>
      val z = score(prior, v)
      val emitted = (k, eventId, v, prior.length.toLong, z)
      prior = (prior :+ v).takeRight(window)
      emitted
    }
    buf.put(prior.toArray)
    out.iterator
  }
}
