package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One row of the sensor FRAME stamped onto an error: the latest valid
  * reading of ONE sensor the user had produced at or before the failure
  * instant. An error emits one row per sensor heard so far. */
case class FrameOut(
    errorId: Long, userId: String, errorTsUs: Long,
    sensorId: String, rTsUs: Long, vMicro: Long, gapUs: Long)

/** Streaming "sensor frame" enrichment — the MapState leg of the
  * arbitrary-state API (ValueState: [[CusumTracker]]/[[AsofTracker]],
  * ListState: [[HistogramTracker]], timers: [[TimerSessionTracker]] —
  * this is the fourth primitive): per user, a MAP sensorId → latest
  * valid reading, so an error is enriched with the full per-sensor
  * state snapshot — the diagnostics panel a UI pins next to a failure.
  * [[AsofTracker]] answers "the last thing we heard" (one value per
  * key); this answers "the last thing we heard FROM EACH sensor"
  * (one value per key PER map entry) — the per-subkey carry that would
  * otherwise force sensorId into the grouping key and lose the
  * cross-sensor view at emission time.
  *
  * The carry discipline is [[AsofTracker]]'s, applied per map slot:
  * rows fold in (tsUs, tag, eventId) order within a batch, a reading
  * only advances its sensor's slot forward in (ts, eventId) order
  * (max eventId wins a timestamp tie; a late replay cannot regress),
  * and at an exact error-ts tie the reading applies first (as-of `>=`).
  * As in [[AsofTracker]], a map slot answers an error only if its
  * carried reading is AT OR BEFORE the error's timestamp — a late
  * cross-batch error older than a slot's reading omits that sensor's
  * row (the frame that was current at its instant is gone; omission,
  * never a negative gap). State is O(users × live sensors);
  * `SensorFrameSpec` proves bit-for-bit agreement with a
  * first-principles batch replay across scrambled micro-batches. */
class SensorFrameTracker extends StatefulProcessor[String, AsofIn, FrameOut] {

  // sensorId -> (rTsUs, eventId, vMicro)
  @transient private var st: MapState[String, (Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[String, (Long, Long, Long)](
      "frame", Encoders.STRING,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[AsofIn],
      timerValues: TimerValues): Iterator[FrameOut] = {
    // fold on a local copy: within-batch updates must be visible to
    // later rows of the same batch regardless of store write latency
    val frame = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    st.iterator().foreach { case (k, v) => frame(k) = v }
    val out = Seq.newBuilder[FrameOut]
    rows.toSeq.sortBy(r => (r.tsUs, r.tag, r.eventId)).foreach { r =>
      if (r.tag == 0) {
        val advance = frame.get(r.sensorId)
          .forall(c => r.tsUs > c._1 || (r.tsUs == c._1 && r.eventId > c._2))
        if (advance) frame(r.sensorId) = (r.tsUs, r.eventId, r.vMicro)
      } else {
        // only slots whose reading is at or before the error qualify —
        // a late cross-batch error must not see a future reading
        frame.toSeq.filter(_._2._1 <= r.tsUs).sortBy(_._1)
          .foreach { case (sid, (rTs, _, v)) =>
            out += FrameOut(r.eventId, key, r.tsUs, sid, rTs, v, r.tsUs - rTs)
          }
      }
    }
    frame.foreach { case (k, v) => st.updateValue(k, v) }
    out.result().iterator
  }
}
