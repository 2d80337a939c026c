package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.operators.DedupOps

/** One banded signature row on the ingest stream: a document appears
  * once per LSH band, keyed by `bandId:bandKey` before
  * `transformWithState`. `sig` is the full MinHash signature (all
  * [[DedupOps.NumHashes]] values, k-order) so a bucket collision can be
  * scored without any second lookup. */
case class LshIn(
    docId: Long, band: Int, bandKey: String,
    sig: Array[Long], ts: Timestamp)

/** One candidate near-dup pair discovered at ingest: `nMatch` of
  * [[DedupOps.NumHashes]] signature positions agree (the same
  * agreement count the batch `minhash_jaccard_est` reports; est-Jaccard
  * = nMatch/NumHashes). Emitted exactly once per (band, pair) — a pair
  * colliding in several bands appears once per band; consumers dedup on
  * (a_id, b_id) exactly as the batch candidate stage's `distinct()`. */
case class LshCandOut(band: Int, aId: Long, bId: Long, nMatch: Int)

/** Stored bucket member: (docId, signature, lastSeenMs). */
case class LshEntry(docId: Long, sig: Array[Long], lastMs: Long)

/** Streaming NEAR-dup discovery at ingest — the LSH twin of the batch
  * `minhash_lsh_dups` candidate stage, completing the stream-dedup
  * family next to [[BloomGate]] (approximate EXACT-dup gate) and
  * [[FingerprintDedupTracker]] (exact fingerprint dedup): a production
  * ingest wants near-dups flagged as documents ARRIVE, not in a nightly
  * batch pass.
  *
  * The expensive half is MAP-SIDE and stateless: each document's
  * MinHash signature folds per ROW over its own shingle array
  * ([[LshDedupTracker.streamInput]] — `array_min(transform(...))` per
  * hash, exactly the values the batch shuffle aggregate produces, since
  * both minimize the same universal hashes over the same distinct
  * shingle set), and banding explodes it to one row per band. Only the
  * bucket join is stateful: state per (band, bandKey) key is the list
  * of in-horizon member (docId, signature) entries; an arriving doc
  * emits one [[LshCandOut]] against every stored member (banding makes
  * bucket size track dup-clique size, never the corpus — the same
  * pigeonhole argument as the batch join), then joins the bucket.
  * Within a micro-batch rows fold in docId order, so pair emission is
  * deterministic under intra-batch scrambling; ids are emitted ordered
  * (min, max).
  *
  * State & eviction: entries older than the retention horizon are
  * evicted by event-time timers exactly like [[TimerSessionTracker]]
  * (one live timer per key at the earliest pending expiry), so state is
  * |in-horizon corpus| × nBands rows — the documented trade being that
  * a near-dup of a document older than the horizon is not flagged
  * (`LshDedupStreamSpec` pins both the batch equality and this
  * forgetting). An at-least-once REDELIVERY of an already-admitted
  * docId refreshes the stored member's lastSeen (max, like
  * [[FingerprintDedupTracker]]) and re-emits nothing, so the
  * per-(band, pair) exactly-once contract survives upstream replay
  * for admitted members; only a doc the cap refused to admit can
  * re-emit on redelivery, since nothing remembers it.
  * `maxBucket` is the streaming form of the batch
  * hot-bucket guard: a bucket at the cap stops ADMITTING new members
  * (arrivals still emit against the capped membership), bounding the
  * per-key quadratic emission that exact-dup cliques would otherwise
  * generate — the batch guard drops the whole over-cap bucket
  * retroactively, which a stream that already emitted cannot do. The
  * DEFAULT is [[LshDedupTracker.DefaultMaxBucket]] (r12): the batch
  * twins treat their df≤64 hot-bucket caps as load-bearing scale
  * guards, and an unbounded streaming default let one boilerplate
  * shingle band grow its ListState and per-arrival scan without bound
  * at ingest; pass [[LshDedupTracker.Uncapped]] explicitly for the
  * uncapped batch-equality form (capped recall differs: a refused doc
  * is never stored, and its at-least-once redelivery re-emits pairs —
  * nothing remembers it). Every refused admission bumps this query
  * run's [[AdmissionDrops]] counter, and a batch whose refusals are
  * nonzero additionally emits one DROP-MARKER row per key (band = -1,
  * ids = -1, `nMatch` = the NEGATED refusal count — every marker field
  * sits outside the valid value space, so a consumer that skips
  * [[LshDedupTracker.observeDrops]] can never mistake one for a
  * candidate pair) so
  * [[LshDedupTracker.observeDrops]] can surface the figure in
  * `StreamingQueryProgress.observedMetrics` — the [[AdmissionDrops]]
  * registry is exact only within one JVM, while observed metrics
  * aggregate across executors, which is what a driver-side monitor on
  * a real cluster can actually read (r14, VERDICT #4). Consumers go
  * through [[LshDedupTracker.observeDrops]] (the [[Heartbeats]]
  * marker/strip pattern): it counts the markers into the metric and
  * strips them, so a capped run's user-facing output is pairs only. */
class LshDedupTracker(retentionMs: Long,
    maxBucket: Int = LshDedupTracker.DefaultMaxBucket)
  extends StatefulProcessor[String, LshIn, LshCandOut] {

  require(retentionMs > 0, s"retentionMs must be positive, got $retentionMs")
  require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")

  @transient private var st: ListState[LshEntry] = _
  @transient private var drops: java.util.concurrent.atomic.LongAdder = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getListState[LshEntry](
      "bucket", Encoders.product[LshEntry], TTLConfig.NONE)
    drops = AdmissionDrops.counter(
      LshDedupTracker.DropsTag, getHandle.getQueryInfo.getRunId)
  }

  private def members(): Vector[LshEntry] = {
    val b = Vector.newBuilder[LshEntry]
    st.get().foreach(b += _)
    b.result()
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[LshIn],
      timerValues: TimerValues): Iterator[LshCandOut] = {
    val entries0 = members()
    var entries = entries0
    val prevTimer =
      if (entries.isEmpty) None else Some(entries.map(_.lastMs).min + retentionMs)
    val out = Vector.newBuilder[LshCandOut]
    var batchDrops = 0
    rows.toSeq.sortBy(_.docId).foreach { r =>
      val member = entries.indexWhere(_.docId == r.docId)
      if (member >= 0) {
        // at-least-once redelivery of an admitted member: refresh its
        // horizon clock (max, like FingerprintDedupTracker) and emit
        // nothing — its pairs already went out once
        if (r.ts.getTime > entries(member).lastMs)
          entries = entries.updated(member,
            entries(member).copy(lastMs = r.ts.getTime))
      } else {
        entries.foreach { e =>
          val n = (0 until DedupOps.NumHashes)
            .count(k => e.sig(k) == r.sig(k))
          out += LshCandOut(r.band,
            math.min(e.docId, r.docId), math.max(e.docId, r.docId), n)
        }
        if (entries.length < maxBucket)
          entries = entries :+ LshEntry(r.docId, r.sig, r.ts.getTime)
        else { drops.increment(); batchDrops += 1 }
      }
    }
    // the cluster-readable half of the refusal count: one marker row
    // per (key, batch) with refusals, counted into observedMetrics and
    // stripped by observeDrops
    if (batchDrops > 0) out += LshCandOut(-1, -1L, -1L, -batchDrops)
    // an admission or a redelivery refresh reassigns `entries` — skip
    // the RocksDB write otherwise (capped or all-duplicate batches
    // leave state untouched)
    if (entries ne entries0) st.put(entries.toArray)
    val newTimer =
      if (entries.isEmpty) None else Some(entries.map(_.lastMs).min + retentionMs)
    if (newTimer != prevTimer) {
      prevTimer.foreach(getHandle.deleteTimer)
      newTimer.foreach(getHandle.registerTimer)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[LshCandOut] = {
    val entries = members()
    val wm = math.max(timerValues.getCurrentWatermarkInMs(),
      expiredTimerInfo.getExpiryTimeInMs())
    val keep = entries.filter(_.lastMs + retentionMs > wm)
    if (keep.isEmpty) st.clear()
    else {
      st.put(keep.toArray)
      getHandle.registerTimer(keep.map(_.lastMs).min + retentionMs)
    }
    Iterator.empty
  }
}

object LshDedupTracker {

  /** Production default for the hot-bucket admission cap, consistent
    * with the batch guards (`PrefixCap`/`ContainCap` = df ≤ 64): a
    * banded-LSH bucket tracks dup-CLIQUE size by the pigeonhole
    * argument, so 64 admits any genuine near-dup clique the batch
    * pipeline would keep, while bounding per-arrival emission scans and
    * the per-key ListState at 64 entries regardless of how boilerplate-
    * heavy the feed is. */
  val DefaultMaxBucket = 64

  /** The explicit no-cap setting for batch-equality callers (r13,
    * ADVICE: a named constant instead of a bare `Int.MaxValue`, so the
    * call site SAYS it opted out of the production default — and the
    * opt-outs are greppable). */
  val Uncapped = Int.MaxValue

  /** [[AdmissionDrops]] tracker tag: read this run's refusal count as
    * `AdmissionDrops.forRun(LshDedupTracker.DropsTag, query.runId)`. */
  val DropsTag = "lsh"

  /** The `observedMetrics` key [[observeDrops]] registers: a monitor
    * reads `progress.observedMetrics.get(DropsMetric)` and sums its
    * `admission_drops` column across progress events. */
  val DropsMetric = "graft.lsh.admission_drops"

  /** Surfaces the tracker's admission refusals in
    * `StreamingQueryProgress` (r14, VERDICT #4) and strips the marker
    * rows from the user-facing output. The [[AdmissionDrops]] registry
    * is a JVM-local static — exact on `local[*]`, per-executor on a
    * real cluster, where the driver cannot read executor statics at
    * all. Marker rows ride the output through the shuffle-free
    * `CollectMetrics` node instead: per micro-batch, the progress
    * event's `observedMetrics(DropsMetric).admission_drops` is the
    * refusal total across ALL keys and executors of that batch, and
    * downstream sees pairs only (markers are stripped here, after the
    * metric counts them). Spark 4.1 ships no StatefulProcessor metric
    * API, so the marker/observe/strip composition — the
    * [[Heartbeats]] pattern — is the supported path. */
  def observeDrops(ds: org.apache.spark.sql.Dataset[LshCandOut])
      : org.apache.spark.sql.Dataset[LshCandOut] = {
    val marker = col("band") === lit(-1)
    ds.observe(DropsMetric,
        coalesce(sum(when(marker, -col("nMatch").cast("long"))), lit(0L))
          .as("admission_drops"))
      .filter(!marker)
  }

  /** THE production composition (r15, ADVICE): the keyed
    * `transformWithState` fused with [[observeDrops]], so the
    * drop-marker protocol can never be half-applied — a consumer that
    * composed the tracker directly and skipped [[observeDrops]]
    * silently received sentinel rows (band = -1, negated counts in
    * nMatch) once the bucket cap tripped, an output-contract change
    * that was enforced by documentation only. This builder is the only
    * main-tree composition path (`CappedTrackerCompositionSpec` fails
    * the suite on a raw `new LshDedupTracker` outside this file); test
    * code exercising the raw tracker (batch-equality at [[Uncapped]],
    * kill/resume recovery with custom time modes) constructs it
    * directly by design. */
  def ingest(in: org.apache.spark.sql.Dataset[LshIn], retentionMs: Long,
      maxBucket: Int = DefaultMaxBucket,
      watermarkDelay: String = "10 seconds")
      : org.apache.spark.sql.Dataset[LshCandOut] =
    observeDrops(in
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => s"${r.band}:${r.bandKey}")(Encoders.STRING)
      .transformWithState(new LshDedupTracker(retentionMs, maxBucket),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[LshCandOut]))

  /** Map-side banded-signature prep for the ingest stream: from
    * (doc_id, text, ts) rows to one [[LshIn]]-shaped row per (doc,
    * band) — NO aggregation, so it composes with `transformWithState`
    * without a chained stateful operator. Signature values equal the
    * batch [[DedupOps.minhashWide]] aggregate's (both minimize the same
    * universal hashes over the same distinct shingle set); band keys
    * equal [[DedupOps.bandsFromShingles]]'s md5 fingerprints. */
  def streamInput(docs: DataFrame): DataFrame = {
    val nBands = DedupOps.NumHashes / DedupOps.BandRows
    val withSig = docs
      .withColumn("sh", DedupOps.shingles(graft.functions.TextFunctions.tokens(col("text"))))
      // empty docs have no shingles and hence no signature — the batch
      // aggregate drops them the same way (no rows after the explode)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", array(DedupOps.seeds.map { case (_, a, b) =>
        array_min(transform(col("sh"),
          s => (lit(a) * DedupOps.h31(s) + lit(b)) % DedupOps.P))
      }: _*))
    val bandStructs = (0 until nBands).map { bnd =>
      val keyCols = (0 until DedupOps.BandRows).map(r =>
        element_at(col("sig"), bnd * DedupOps.BandRows + r + 1).cast("string"))
      struct(lit(bnd).as("band"), md5(concat_ws("_", keyCols: _*)).as("bandKey"))
    }
    withSig
      .select(col("doc_id").as("docId"), col("sig"), col("ts"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("docId"), col("bk.band").as("band"),
        col("bk.bandKey").as("bandKey"), col("sig"), col("ts"))
  }
}
