package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: the error-context enrichment the batch
  * entry `error_context_join` (TimeSeriesQueries) computes, as a live
  * two-stream join — "for every malformed event, the same user's valid
  * readings within ±5 minutes".
  *
  * The scale contract is the WATERMARKS: an unwatermarked stream-stream
  * join buffers both sides forever (state grows with the stream). With
  * both sides watermarked and the join condition time-bounded in BOTH
  * directions, Spark derives a state-eviction horizon per side — a
  * reading can be dropped once the error-side watermark passes
  * `r_ts + 5 min`, an error once the reading-side watermark passes
  * `error_ts + 5 min` — so state is bounded by (delay + range) × input
  * rate regardless of stream length. StreamStreamJoinSpec asserts this
  * with state-store row accounting across watermark advances, and proves
  * the emitted pairs equal the batch twin's join on the same fixture.
  */
object IntervalJoin {

  /** The ±window each error event searches for same-user readings. Kept
    * equal to the batch entry's literal INTERVAL 5 MINUTES. */
  val RangeMinutes = 5

  /** Inner interval join of an error stream against a readings stream.
    *
    * @param errors   streaming frame (error_id LONG, user_id LONG,
    *                 error_ts TIMESTAMP)
    * @param readings streaming frame (user_id LONG, sensor_id STRING,
    *                 r_ts TIMESTAMP, v_micro LONG)
    * @param delay    watermark delay for BOTH sides — the out-of-orderness
    *                 budget (pick it from `event_lateness_profile`, not by
    *                 guessing)
    */
  def errorContext(errors: DataFrame, readings: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    val e = errors.withWatermark("error_ts", delay).as("e")
    val r = readings.withWatermark("r_ts", delay).as("r")
    e.join(r,
        expr(s"""e.user_id = r.user_id AND
                 r_ts >= error_ts - INTERVAL $RangeMinutes MINUTES AND
                 r_ts <= error_ts + INTERVAL $RangeMinutes MINUTES"""))
      .select(col("e.error_id"), col("e.user_id"), col("error_ts"),
        col("r.sensor_id"), col("r_ts"), col("r.v_micro"))
  }
}
