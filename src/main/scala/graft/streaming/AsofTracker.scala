package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One tagged event on the as-of stream: readings carry `tag = 0` with
  * their sensor id and exact micro-unit value; errors carry `tag = 1`
  * (sensorId/vMicro unused). Mirrors the union-tag frame the batch
  * query builds before its carry window. */
case class AsofIn(
    userId: String, tsUs: Long, tag: Int, eventId: Long,
    sensorId: String, vMicro: Long)

/** One enriched error row — the same seven columns the batch
  * `error_asof_reading` query emits (timestamps as exact epoch
  * microseconds). `None` reading fields = no prior reading (ASOF LEFT). */
case class AsofOut(
    errorId: Long, userId: String, errorTsUs: Long,
    sensorId: Option[String], rTsUs: Option[Long],
    vMicro: Option[Long], gapUs: Option[Long])

/** Streaming twin of the batch `error_asof_reading` query
  * (`TimeSeriesQueries.errorAsofReading`): per-user AS-OF enrichment as
  * `transformWithState` state. Where the batch form needs the union-tag
  * carry window (one hash shuffle + per-user sort), the streaming form
  * holds exactly ONE value per user — the most recent valid reading —
  * and stamps it onto each error as it arrives. This is the as-of join's
  * natural incremental shape: state is O(users), never a buffer of the
  * feed, so key cardinality is the only memory bound (contrast the
  * interval join's watermark-bounded two-sided buffers in
  * [[IntervalJoin]] — "around the failure" needs a window of rows,
  * "last thing we heard" needs one).
  *
  * Exactness: the carry discipline is the batch query's, replayed
  * incrementally. Rows inside a micro-batch fold in the batch carry
  * order (tsUs, tag, eventId) — so at an exact error-ts tie the reading
  * applies FIRST (ASOF's `>=`), and among same-timestamp readings the
  * max eventId wins (the oracle's per-(user, ts) rn = 1 dedup). Across
  * micro-batches a stale reading (older than the held state, a replayed
  * or late row) must NOT regress the carry, so the state update is
  * guarded by the same (tsUs, eventId) order rather than blind
  * overwrite. Values are exact integer micro-units end to end — no
  * float drift. `AsofTrackerSpec` asserts bit-for-bit agreement with
  * the DuckDB-ASOF-oracled batch output across scrambled micro-batches.
  *
  * Errors are emitted exactly once, in the micro-batch that carries
  * them; an error with no prior reading emits null reading columns
  * rather than waiting (matching ASOF LEFT — streaming cannot know a
  * reading will never arrive, and the batch semantics say "at or
  * before", so there is nothing to wait for).
  *
  * Cross-batch lateness: with `TimeMode.None` there is no lateness
  * bound, so an ERROR row can arrive in a later micro-batch with tsUs
  * older than the carried reading. The O(1) state cannot answer that
  * error exactly (the reading that was current AT its timestamp is
  * gone), and stamping the newer reading would fabricate a
  * future-looking enrichment with a negative gap — so the emit guard
  * requires `carried.rTsUs <= error.tsUs` and degrades to the ASOF-LEFT
  * null columns otherwise. Bit-for-bit agreement with the batch oracle
  * therefore holds for cross-batch event-time-ordered error delivery
  * (readings may still arrive late or replayed in any order); a
  * genuinely late error is answered conservatively, never wrongly. */
class AsofTracker extends StatefulProcessor[String, AsofIn, AsofOut] {

  // (rTsUs, eventId, sensorId, vMicro) of the user's most recent reading
  @transient private var st: ValueState[(Long, Long, String, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, String, Long)](
      "lastReading",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.STRING, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[AsofIn],
      timerValues: TimerValues): Iterator[AsofOut] = {
    var cur: Option[(Long, Long, String, Long)] =
      if (st.exists()) Some(st.get()) else None
    val out = Seq.newBuilder[AsofOut]
    rows.toSeq.sortBy(r => (r.tsUs, r.tag, r.eventId)).foreach { r =>
      if (r.tag == 0) {
        // advance the carry only forward in (ts, eventId) order: the max
        // eventId wins a timestamp tie, and a late/replayed older reading
        // cannot regress the state
        if (cur.forall(c => r.tsUs > c._1 || (r.tsUs == c._1 && r.eventId > c._2)))
          cur = Some((r.tsUs, r.eventId, r.sensorId, r.vMicro))
      } else {
        out += (cur match {
          // the carry answers this error only if it is AT OR BEFORE the
          // error's timestamp — a late cross-batch error older than the
          // carried reading degrades to the LEFT nulls (see scaladoc)
          case Some((rTs, _, sid, v)) if rTs <= r.tsUs =>
            AsofOut(r.eventId, key, r.tsUs,
              Some(sid), Some(rTs), Some(v), Some(r.tsUs - rTs))
          case _ =>
            AsofOut(r.eventId, key, r.tsUs, None, None, None, None)
        })
      }
    }
    cur.foreach(st.update)
    out.result().iterator
  }
}
