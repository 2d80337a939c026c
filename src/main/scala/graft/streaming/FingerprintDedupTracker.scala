package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** One document on the ingest stream, keyed by content fingerprint
  * before `transformWithState`. `ts` is the event-time column the
  * watermark is declared on. */
case class DedupIn(docId: Long, fingerprint: String, ts: Timestamp)

/** The per-document dedup verdict — the same three-way label the batch
  * `incremental_dedup` query emits. */
case class DedupOut(docId: Long, fingerprint: String, status: String)

/** Streaming twin of the batch `incremental_dedup` query
  * (`DedupQueries.incrementalDedup`): EXACT fingerprint dedup of an
  * ingest stream against a pre-existing base index plus itself — the
  * production stream-dedup shape that `dropDuplicatesWithinWatermark`
  * approximates, completing the incremental-ingest family next to the
  * approximate [[BloomGate]].
  *
  * The base fingerprint index arrives as transformWithState INITIAL
  * STATE (`handleInitialState` marks each base fingerprint's key before
  * the first micro-batch) — the streaming analog of the batch query's
  * `base` side, which at 100 TB is the bucketed fingerprint table. Each
  * stream row is labeled exactly as the batch does: `dup_of_base` when
  * the key was base-initialized, `dup_in_delta` when an earlier stream
  * row already claimed the fingerprint, `new` otherwise (first
  * occurrence wins; within a micro-batch rows fold in docId order,
  * matching the batch window's `ORDER BY doc_id`).
  *
  * Cross-batch ordering contract (same as the other recursive
  * trackers): micro-batches arrive in docId order across batches —
  * rows may be scrambled WITHIN a batch — so first-arrival equals the
  * batch query's min-docId winner.
  *
  * State & eviction: one (origin, lastSeenMs) pair per LIVE
  * fingerprint. Base-initialized keys are the durable index half and
  * never self-expire; stream-DISCOVERED keys (origin = delta) carry an
  * event-time timer at lastSeen + retention and are cleared once the
  * watermark passes it — exactly `dropDuplicatesWithinWatermark`'s
  * bound, so streaming state is |base index| + |fingerprints seen
  * within the retention horizon|, never feed-sized. The documented
  * trade: a delta fingerprint re-sent after eviction reports `new`
  * again, so set-equality with the batch query holds when retention
  * covers the replayed horizon (`StreamingExactDedupSpec` pins both the
  * equality and the post-eviction re-admission). */
class FingerprintDedupTracker(retentionMs: Long)
  extends StatefulProcessorWithInitialState[String, DedupIn, DedupOut, Boolean] {

  require(retentionMs > 0, s"retentionMs must be positive, got $retentionMs")

  private val OriginBase = 1
  private val OriginDelta = 2

  // (origin, lastSeenMs); lastSeen only drives the delta-key timer
  @transient private var st: ValueState[(Int, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Int, Long)](
      "seen",
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInitialState(
      key: String, initialState: Boolean, timerValues: TimerValues): Unit =
    if (initialState) st.update((OriginBase, Long.MinValue))

  override def handleInputRows(
      key: String,
      rows: Iterator[DedupIn],
      timerValues: TimerValues): Iterator[DedupOut] = {
    val (origin0, last0) = if (st.exists()) st.get() else (0, Long.MinValue)
    var (origin, last) = (origin0, last0)
    val prevTimer = if (origin == OriginDelta) Some(last + retentionMs) else None
    // within-batch fold in docId order — the batch window's tie-break
    val out = rows.toSeq.sortBy(_.docId).map { r =>
      val status = origin match {
        case OriginBase  => "dup_of_base"
        case OriginDelta => "dup_in_delta"
        case _           => origin = OriginDelta; "new"
      }
      if (origin == OriginDelta) last = math.max(last, r.ts.getTime)
      DedupOut(r.docId, key, status)
    }
    // base keys see only dup_of_base traffic and never change state —
    // skip the per-batch RocksDB write for them
    if (origin != origin0 || last != last0) st.update((origin, last))
    // one live timer per delta key, at lastSeen + retention; base keys
    // are the durable index and never arm
    if (origin == OriginDelta) {
      val newTimer = Some(last + retentionMs)
      if (newTimer != prevTimer) {
        prevTimer.foreach(getHandle.deleteTimer)
        newTimer.foreach(getHandle.registerTimer)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[DedupOut] = {
    if (st.exists()) {
      val (origin, last) = st.get()
      val wm = math.max(timerValues.getCurrentWatermarkInMs(),
        expiredTimerInfo.getExpiryTimeInMs())
      if (origin == OriginDelta) {
        if (last + retentionMs <= wm) st.clear()
        // a row moved lastSeen after this timer was armed and the
        // re-arm raced the firing — arm at the true horizon
        else getHandle.registerTimer(last + retentionMs)
      }
    }
    Iterator.empty
  }
}
