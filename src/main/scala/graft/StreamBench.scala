package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.SensorOps
import graft.sources.SensorGenerator
import graft.streaming.SensorPipeline

/** Dev-only throughput probe for the reference-parity pipeline: how many
  * wire events/second the FULL computation (JSON parse with explicit
  * schema → try-cast validate → event-time conversion → watermarked
  * 1-minute windowed multi-key metrics) sustains on this single node.
  *
  * The reference's operating point is its simulator's configured ~132
  * msg/s (BASELINE.md) — that is an input RATE, not an engine limit, so
  * the honest comparison is: our sustained single-node maximum through
  * the same computation, measured two ways:
  *   - batch leg: the identical plan over N pre-materialized wire
  *     payloads (the engine's raw compute ceiling);
  *   - streaming leg: MemoryStream micro-batches through Structured
  *     Streaming with watermark + state store (the deployment shape).
  * Input synthesis and caching happen OFF the clock. Payload
  * distribution mirrors the simulator (3 stations / 33 sensors, 5%
  * malformed).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nBatch = args.headOption.filterNot(_ == "state-curves")
      .map(_.toLong).getOrElse(2000000L)
    val nStream = args.drop(1).headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // state-size curves sample per-trigger progress; keep enough of them
      .config("spark.sql.streaming.numRecentProgressUpdates", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (args.headOption.contains("state-curves")) {
      stateCurves(spark)
      spark.stop()
      return
    }

    val stations = Map("alpha" -> 15, "beta" -> 10, "gamma" -> 8)

    def wire(n: Long) = {
      // monotone event time: 33 sensors × 1 reading / 250 ms, like the sim
      val base = spark.range(n).select(
        col("id").as("value"),
        timestamp_millis(lit(1700000000000L) + expr("id div 33") * 250).as("timestamp"))
      SensorGenerator.withPayload(base, stations, 0.05)
        .select(to_json(struct(
          col("station_name"), col("station_id"), col("sensor_id"),
          col("timestamp"), col("value"))).as("value"))
    }

    // every leg's timed section is contention-gated (r12, extending the
    // r11 Bench gate): the probe waits out steal waves and its reading
    // is appended to the leg's printed line, so a contaminated rate is
    // self-identifying. r13 adds an END-of-body probe to every leg
    // (mirroring Bench's probe_sec_end): the start gate cannot see a
    // steal wave that begins mid-leg, and the long file-source legs are
    // exactly the rows that can straddle one.
    def gateStamp(label: String): String = {
      val g = graft.ContentionGate.awaitCalm(spark, 32, label = label)
      f" probe=${g.probeSec}%.3f contended=${g.contended}"
    }
    def endStamp(): String =
      f" probe_end=${graft.ContentionGate.probe(spark, 32)}%.3f"

    // ---- batch leg: full plan over cached wire payloads -----------------
    val batchIn = wire(nBatch).cache()
    batchIn.count() // materialize input off the clock
    val gate0 = gateStamp("batch_pipeline")
    val t0 = System.nanoTime()
    val outRows = SensorOps.windowedMetrics(
      SensorPipeline.fromRawJson(batchIn),
      col("event_time"),
      Seq(col("station_id"), col("station_name"), col("sensor_id")),
      "1 minute").count()
    val tBatch = (System.nanoTime() - t0) / 1e9
    println(f"[streambench] batch_pipeline n=$nBatch out_rows=$outRows t=$tBatch%.2f s rate=${nBatch / tBatch}%.0f events/s$gate0${endStamp()}")
    batchIn.unpersist()

    // ---- streaming leg A: file source, Trigger.AvailableNow -------------
    // distributed source (no driver-side feeding): payloads pre-written as
    // text files off the clock, processed to completion in micro-batches
    val fsDir = java.nio.file.Files.createTempDirectory("streambench").toString
    wire(nBatch).repartition(32).write.mode("overwrite").text(fsDir)
    val fsIn = spark.readStream.option("maxFilesPerTrigger", "8").text(fsDir)
    val fsMetrics = SensorPipeline.windowedMetrics(
      SensorPipeline.fromRawJson(fsIn), "5 seconds", "1 minute")
    val gateFs = gateStamp("streaming_filesource")
    val t2 = System.nanoTime()
    val qf = fsMetrics.writeStream.outputMode("update")
      .format("memory").queryName("fsbench")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qf.awaitTermination()
    val tFs = (System.nanoTime() - t2) / 1e9
    println(f"[streambench] streaming_filesource n=$nBatch state_rows=${spark.table("fsbench").count()} t=$tFs%.2f s rate=${nBatch / tFs}%.0f events/s$gateFs${endStamp()}")

    // ---- streaming leg B: MemoryStream micro-batches --------------------
    implicit val ctx = spark.sqlContext
    val payloads = wire(nStream).as[String].collect()
    val input = MemoryStream[String]
    val metrics = SensorPipeline.windowedMetrics(
      SensorPipeline.fromRawJson(input.toDF()), "5 seconds", "1 minute")
    val q = metrics.writeStream.outputMode("update")
      .format("memory").queryName("streambench").start()
    try {
      val batches = payloads.grouped(math.max(1, payloads.length / 5)).toSeq
      val gateMb = gateStamp("streaming_microbatch")
      val t1 = System.nanoTime()
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val tStream = (System.nanoTime() - t1) / 1e9
      val stateRows = spark.table("streambench").count()
      println(f"[streambench] streaming_microbatch n=$nStream batches=${batches.length} state_rows=$stateRows t=$tStream%.2f s rate=${nStream / tStream}%.0f events/s$gateMb${endStamp()}")
    } finally q.stop()

    // ---- streaming leg C: as-of enrichment tracker ----------------------
    // per-key ValueState carry on RocksDB (the AsofTracker operating
    // point): 5000 live users, 10% errors — each error row is enriched
    // with its user's carried last reading. Input synthesized off the
    // clock; the measured rate is the transformWithState path end to end.
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val asofRows = spark.range(nStream).select(
        concat(lit("u"), pmod(col("id"), lit(5000L))).as("userId"),
        (lit(1700000000000000L) + col("id") * 1000L).as("tsUs"),
        when(pmod(col("id"), lit(10L)) === 0, 1).otherwise(0).as("tag"),
        col("id").as("eventId"),
        concat(lit("s"), pmod(col("id"), lit(33L))).as("sensorId"),
        (col("id") * 37L).as("vMicro"))
      .as[graft.streaming.AsofIn].collect()
    val asofIn = MemoryStream[graft.streaming.AsofIn]
    val enriched = asofIn.toDS().groupByKey(_.userId)
      .transformWithState(new graft.streaming.AsofTracker,
        TimeMode.None(), OutputMode.Append())
    val qa = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asofbench").start()
    try {
      val batches = asofRows.grouped(math.max(1, asofRows.length / 5)).toSeq
      val gateAsof = gateStamp("streaming_asof")
      val t3 = System.nanoTime()
      batches.foreach { b => asofIn.addData(b.toSeq); qa.processAllAvailable() }
      val tA = (System.nanoTime() - t3) / 1e9
      println(f"[streambench] streaming_asof n=$nStream out_rows=${spark.table("asofbench").count()} t=$tA%.2f s rate=${nStream / tA}%.0f events/s$gateAsof${endStamp()}")
    } finally qa.stop()

    // ---- streaming leg D: windowed top-k tracker -------------------------
    // MapState (sum, count) partials per 1-min window × 33 stations × 8
    // sensors, event-time timers closing each window (the TopKWindowTracker
    // operating point). Rows arrive in event-time order across batches so
    // every window but the last closes mid-run — the measured rate includes
    // timer-driven emission, not just state folds.
    val winMs = 60L * 1000
    val topkRows = spark.range(nStream).select(
        (lit(1700000000000L) + col("id") * 10L).as("tsMs"),
        concat(lit("st"), pmod(col("id"), lit(33L))).as("stationId"),
        concat(lit("sn"), pmod(col("id"), lit(8L))).as("sensorId"),
        (pmod(col("id") * 37L, lit(1000000L)).cast("double") / 1000.0).as("v"))
      .as[(Long, String, String, Double)].collect()
      .map { case (ts, st, sn, v) =>
        graft.streaming.TopKIn(ts - java.lang.Math.floorMod(ts, winMs),
          new java.sql.Timestamp(ts), st, sn, Some(v))
      }
    val topkIn = MemoryStream[graft.streaming.TopKIn]
    val ranked = topkIn.toDS()
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.windowStartMs)
      .transformWithState(new graft.streaming.TopKWindowTracker(3, winMs),
        TimeMode.EventTime(), OutputMode.Append())
    val qt = ranked.writeStream.outputMode("append")
      .format("memory").queryName("topkbench").start()
    try {
      val batches = topkRows.grouped(math.max(1, topkRows.length / 5)).toSeq
      val gateTopk = gateStamp("streaming_topk")
      val t4 = System.nanoTime()
      batches.foreach { b => topkIn.addData(b.toSeq); qt.processAllAvailable() }
      val tT = (System.nanoTime() - t4) / 1e9
      println(f"[streambench] streaming_topk n=$nStream out_rows=${spark.table("topkbench").count()} t=$tT%.2f s rate=${nStream / tT}%.0f events/s$gateTopk${endStamp()}")
    } finally qt.stop()


    // ---- streaming leg E: top-k tracker via FILE source, AvailableNow ----
    // the deployment-shaped twin of leg D: no driver-side feeding — rows
    // pre-written as parquet off the clock, consumed in file micro-batches
    // through the same watermark + MapState + event-time-timer pipeline,
    // so the measured rate bounds the STATE STORE path, not MemoryStream.
    // Uses the larger batch-leg row count: the driver feed is no longer
    // the limiting factor.
    val topkFsRows = spark.range(nBatch).select(
        (lit(1700000000000L) + col("id") * 10L).as("tsMs"),
        concat(lit("st"), pmod(col("id"), lit(33L))).as("stationId"),
        concat(lit("sn"), pmod(col("id"), lit(8L))).as("sensorId"),
        (pmod(col("id") * 37L, lit(1000000L)).cast("double") / 1000.0).as("v"))
      .select(
        (col("tsMs") - pmod(col("tsMs"), lit(winMs))).as("windowStartMs"),
        timestamp_millis(col("tsMs")).as("ts"),
        col("stationId"), col("sensorId"), col("v").as("valueNumeric"))
    val topkDir = java.nio.file.Files.createTempDirectory("topkfsbench").toString
    // range-partition by event time so file listing order tracks event
    // time (a real partitioned source's arrival order): a hash
    // repartition scrambles times across files and the advancing
    // watermark late-drops a large share of rows, inflating the rate
    topkFsRows.repartitionByRange(32, col("ts"))
      .write.mode("overwrite").parquet(topkDir)
    orderFileMtimes(topkDir)
    val tfsIn = spark.readStream
      .schema(topkFsRows.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(topkDir)
      .as[graft.streaming.TopKIn]
    val rankedFs = tfsIn
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.windowStartMs)
      .transformWithState(new graft.streaming.TopKWindowTracker(3, winMs),
        TimeMode.EventTime(), OutputMode.Append())
    val gateTopkFs = gateStamp("streaming_topk_filesource")
    val t5 = System.nanoTime()
    val qtf = rankedFs.writeStream.outputMode("append")
      .format("memory").queryName("topkfsbench")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qtf.awaitTermination()
    val tTF = (System.nanoTime() - t5) / 1e9
    println(f"[streambench] streaming_topk_filesource n=$nBatch out_rows=${spark.table("topkfsbench").count()} t=$tTF%.2f s rate=${nBatch / tTF}%.0f events/s$gateTopkFs${endStamp()}")

    // ---- streaming leg F: exact-dedup fingerprint gate --------------------
    // FingerprintDedupTracker operating point: ~3 stream rows per
    // fingerprint (so the dup branches do real work), 100k-fingerprint
    // base index pre-loaded as initial state, per-key ValueState +
    // event-time eviction timers on RocksDB. Input synthesized and the
    // base index built off the clock.
    val dedupRows = spark.range(nStream).select(
        col("id").as("docId"),
        concat(lit("fp"), expr("id div 3")).as("fingerprint"),
        timestamp_millis(lit(1700000000000L) + col("id") * 10L).as("ts"))
      .as[graft.streaming.DedupIn].collect()
    val dedupInit = spark.range(100000)
      .select(concat(lit("base"), col("id")).as("fp")).as[String]
      .groupByKey(identity).mapValues(_ => true)
    val dedupIn = MemoryStream[graft.streaming.DedupIn]
    val gated = dedupIn.toDS()
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.fingerprint)
      .transformWithState(new graft.streaming.FingerprintDedupTracker(3600000L),
        TimeMode.EventTime(), OutputMode.Append(), dedupInit)
    val qd = gated.writeStream.outputMode("append")
      .format("memory").queryName("dedupbench").start()
    try {
      val batches = dedupRows.grouped(math.max(1, dedupRows.length / 5)).toSeq
      val gateDedup = gateStamp("streaming_dedup_gate")
      val t6 = System.nanoTime()
      batches.foreach { b => dedupIn.addData(b.toSeq); qd.processAllAvailable() }
      val tD = (System.nanoTime() - t6) / 1e9
      println(f"[streambench] streaming_dedup_gate n=$nStream out_rows=${spark.table("dedupbench").count()} t=$tD%.2f s rate=${nStream / tD}%.0f events/s$gateDedup${endStamp()}")
    } finally qd.stop()

    // ---- streaming leg G: dedup gate via FILE source, AvailableNow -------
    // the deployment-shaped twin of leg F at the batch-leg row count:
    // rows pre-written as parquet off the clock, so the measured rate
    // bounds the keyed ValueState + eviction-timer path, not driver
    // feeding
    val dedupFsRows = spark.range(nBatch).select(
        col("id").as("docId"),
        concat(lit("fp"), expr("id div 3")).as("fingerprint"),
        timestamp_millis(lit(1700000000000L) + col("id") * 10L).as("ts"))
    val dedupDir = java.nio.file.Files.createTempDirectory("dedupfsbench").toString
    // same event-time range partitioning as the top-k file leg (a hash
    // repartition here measured a stream with ~half its rows
    // late-dropped: out_rows 1.0M of 2M)
    dedupFsRows.repartitionByRange(32, col("ts"))
      .write.mode("overwrite").parquet(dedupDir)
    orderFileMtimes(dedupDir)
    val dfsIn = spark.readStream
      .schema(dedupFsRows.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(dedupDir)
      .as[graft.streaming.DedupIn]
    val gatedFs = dfsIn
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.fingerprint)
      .transformWithState(new graft.streaming.FingerprintDedupTracker(3600000L),
        TimeMode.EventTime(), OutputMode.Append(), dedupInit)
    val gateDedupFs = gateStamp("streaming_dedup_gate_filesource")
    val t7 = System.nanoTime()
    val qdf = gatedFs.writeStream.outputMode("append")
      .format("memory").queryName("dedupfsbench")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qdf.awaitTermination()
    val tDF = (System.nanoTime() - t7) / 1e9
    println(f"[streambench] streaming_dedup_gate_filesource n=$nBatch out_rows=${spark.table("dedupfsbench").count()} t=$tDF%.2f s rate=${nBatch / tDF}%.0f events/s$gateDedupFs${endStamp()}")

    // ---- streaming leg H: LSH near-dup discovery at ingest ---------------
    // LshDedupTracker end to end via FILE source: the map-side banded
    // MinHash prep (shingle + 12 hash folds per row) runs INSIDE the
    // stream — the measured rate is honest docs/second for the whole
    // ingest near-dedup path. Corpus: the sf0.1 documents replicated 8×
    // with near-dup suffixes (each base doc becomes an 8-clique), rows
    // event-time-ordered like the other file legs.
    val lshSfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = graft.sources.Tables.documents(spark, lshSfDir)
      .select(col("doc_id"), col("text"))
    val nBase = docs0.count()
    val lshDocs = (0 until 8).map { i =>
      docs0.select((col("doc_id") * 8 + i).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionAll _)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id") * 10L))
    val nLshDocs = nBase * 8
    val lshDir = java.nio.file.Files.createTempDirectory("lshfsbench").toString
    lshDocs.repartitionByRange(32, col("ts")).write.mode("overwrite").parquet(lshDir)
    orderFileMtimes(lshDir)
    val lshIn = spark.readStream
      .schema(lshDocs.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(lshDir)
    val lshCands = graft.streaming.LshDedupTracker.streamInput(lshIn)
      .as[graft.streaming.LshIn]
      .withWatermark("ts", "10 seconds")
      .groupByKey(r => s"${r.band}:${r.bandKey}")
      .transformWithState(new graft.streaming.LshDedupTracker(3600000L),
        TimeMode.EventTime(), OutputMode.Append())
    val gateLsh = gateStamp("streaming_lsh_neardup_filesource")
    val t8 = System.nanoTime()
    val ql = lshCands.writeStream.outputMode("append")
      .format("memory").queryName("lshfsbench")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    ql.awaitTermination()
    val tL = (System.nanoTime() - t8) / 1e9
    println(f"[streambench] streaming_lsh_neardup_filesource docs=$nLshDocs cand_rows=${spark.table("lshfsbench").count()} t=$tL%.2f s rate=${nLshDocs / tL}%.0f docs/s max_bucket=${graft.streaming.LshDedupTracker.DefaultMaxBucket} admission_drops=${graft.streaming.AdmissionDrops.forRun(graft.streaming.LshDedupTracker.DropsTag, ql.runId)}$gateLsh${endStamp()}")

    // ---- streaming leg I: semantic (embedding) near-dup at ingest --------
    // SemanticDedupTracker via FILE source: map-side hyperplane bucket +
    // norm per row, then the within-bucket exact-cosine join against
    // in-horizon state. Corpus: the sf embeddings replicated 8x (exact
    // duplicates — every replica pair scores cos = 1), so per-bucket
    // membership grows to ~corpus/64 x 8 and the quadratic-in-bucket
    // emission is exercised, not dodged.
    val emb0 = graft.sources.Tables.embeddings(spark, lshSfDir)
      .select(col("vec_id"), col("embedding"))
    val nEmbBase = emb0.count()
    val semDocs = (0 until 8).map { i =>
      emb0.select((col("vec_id") * 8 + i).as("vec_id"), col("embedding"))
    }.reduce(_ unionAll _)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("vec_id") * 10L))
    val nSem = nEmbBase * 8
    val semDir = java.nio.file.Files.createTempDirectory("semfsbench").toString
    graft.streaming.SemanticDedupTracker.streamInput(semDocs)
      .repartitionByRange(32, col("ts")).write.mode("overwrite").parquet(semDir)
    orderFileMtimes(semDir)
    val semSchema = graft.streaming.SemanticDedupTracker.streamInput(semDocs).schema
    val semIn = spark.readStream
      .schema(semSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(semDir)
      .as[graft.streaming.SemIn]
    val semCands = semIn
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.bucket)
      .transformWithState(new graft.streaming.SemanticDedupTracker(3600000L),
        TimeMode.EventTime(), OutputMode.Append())
    val gateSem = gateStamp("streaming_semantic_neardup_filesource")
    val t9 = System.nanoTime()
    val qs = semCands.writeStream.outputMode("append")
      .format("memory").queryName("semfsbench")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qs.awaitTermination()
    val tS = (System.nanoTime() - t9) / 1e9
    println(f"[streambench] streaming_semantic_neardup_filesource vecs=$nSem cand_rows=${spark.table("semfsbench").count()} t=$tS%.2f s rate=${nSem / tS}%.0f vecs/s max_bucket=${graft.streaming.SemanticDedupTracker.DefaultMaxBucket} admission_drops=${graft.streaming.AdmissionDrops.forRun(graft.streaming.SemanticDedupTracker.DropsTag, qs.runId)}$gateSem${endStamp()}")
    spark.stop()
  }

  // FileStreamSource batches files by MODIFICATION time, not path, and
  // a bulk write stamps every part with the same mtime — so even
  // range-partitioned files enqueue in scrambled order and the
  // advancing watermark late-drops rows (measured: half the dedup
  // feed). Stamp increasing mtimes in path (= range) order so triggers
  // consume event time monotonically, like a dated-directory ingest.
  private def orderFileMtimes(dir: String): Unit =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        // a silent setLastModified failure re-creates the scrambled
        // enqueue this helper exists to prevent (half the feed
        // late-dropped, rate inflated) — refuse to measure instead
        require(f.setLastModified(1700000000000L + i * 60000L),
          s"setLastModified failed for $f — mtime ordering not applied") }

  /** Per-query running max of the state observables, fed by the
    * listener bus instead of `q.recentProgress` (r12, ADVICE fix): the
    * progress buffer truncates at `numRecentProgressUpdates` entries and
    * `.max` over an empty array throws — a feed with more triggers than
    * the buffer silently under-reported the peak. The listener sees
    * EVERY progress event; `recentProgress` is still merged in after
    * termination as a floor against late listener delivery (the bus is
    * async), and a leg that produced no progress at all fails loudly in
    * [[stateCurves]] rather than recording a fabricated zero row. */
  private class StateMaxListener(queryName: String)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val maxRows = new java.util.concurrent.atomic.AtomicLong(-1L)
    val maxSst = new java.util.concurrent.atomic.AtomicLong(-1L)
    val lastBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
    val nProgress = new java.util.concurrent.atomic.AtomicLong(0L)
    def observe(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit = {
      nProgress.incrementAndGet()
      maxRows.accumulateAndGet(p.stateOperators.map(_.numRowsTotal).sum, math.max(_, _))
      maxSst.accumulateAndGet(StreamBench.sstBytes(p), math.max(_, _))
      lastBatch.accumulateAndGet(p.batchId, math.max(_, _))
    }
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      if (e.progress.name == queryName) observe(e.progress)
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  /** The RocksDB live-data size observable (r12, replacing
    * `memoryUsedBytes` in the curve rows): `memoryUsedBytes` is
    * block-cache/memtable-dominated and ANTI-correlated with state rows
    * in the r11 artifact (209→185 MB while rows grew 136k→226k) — a
    * consumer could read "memory shrinks as state grows". The provider's
    * `rocksdbSstFileSize` custom metric is the on-disk SST total, i.e.
    * live data plus bounded compaction debt, the number that actually
    * tracks members. Rows/members stay the authoritative curve. */
  private def sstBytes(
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): Long =
    p.stateOperators.map { op =>
      Option(op.customMetrics.get("rocksdbSstFileSize")).fold(0L)(_.longValue)
    }.sum

  /** STATE-SIZE curves for the stream-dedup tracker family (r11): the
    * trackers claim horizon-bounded state — "index + in-horizon corpus,
    * never feed-sized" — and until now no artifact measured it. This mode
    * (`runMain graft.StreamBench state-curves`) replays each tracker's
    * file-source leg at three retention horizons over an event-time span
    * MUCH longer than the largest horizon, tracks the per-trigger state
    * observables (numRowsTotal keys; rocksdbSstFileSize live-data bytes)
    * through a listener, and appends one JSON line per (tracker, horizon)
    * to the SCALE artifact. The claim holds iff state_rows_max tracks
    * horizon × key-rate (plus the fixed base index for the fingerprint
    * gate), not feed size. Every leg is contention-gated and stamped
    * (r12 — the r11 `state_lsh_neardup` 2400 s-horizon wall was recorded
    * inside a steal wave with no gate).
    *
    * Trigger granularity matters: state peaks between watermark-driven
    * evictions, so each micro-batch must cover event time ≪ horizon —
    * 128 single-file triggers over the span keep the trigger quantum at
    * ~2-4% of the smallest horizon. */
  private def stateCurves(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // SPARK_GRAFT_ROCKSDB_CHANGELOG (1/0): force per-commit CHANGELOG
    // uploads on or off — full RocksDB snapshot zips per commit (the
    // provider default on this build is false = snapshot mode,
    // bytecode-verified) carry a maintenance cost ∝ retained keys,
    // which changelog mode removes (A/B on the 2400 s-horizon LSH leg:
    // 217.6 s snapshot vs 135.1 s changelog, wall flat across horizons).
    // UNSET leaves the provider default; the row stamps the EFFECTIVE
    // value as "changelog" so A/B lines are distinguishable.
    val changelogConf =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    sys.env.get("SPARK_GRAFT_ROCKSDB_CHANGELOG")
      .foreach(v => spark.conf.set(changelogConf, (v == "1").toString))
    val changelog = spark.conf.get(changelogConf, "false")
    val scaleOut = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_r13.json")
    def emit(line0: String): Unit = {
      // splice the changelog stamp in before the closing brace
      val line = line0.stripSuffix("}") + s""","changelog":$changelog}"""
      println(s"[scale] $line")
      java.nio.file.Files.write(java.nio.file.Paths.get(scaleOut),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    /** One completed state-curve leg. `probeEnd` is the END-of-body
      * contention probe (r13, mirroring Bench's probe_sec_end — the
      * start gate cannot see a steal wave that begins mid-leg, and
      * these are the repo's longest single recordings); `runId` keys
      * this run's [[graft.streaming.AdmissionDrops]] counters. */
    case class LegResult(wall: Double, outRows: Long, stateRowsMax: Long,
        sstMax: Long, lastBatch: Long, probeEnd: Double,
        runId: java.util.UUID)
    /** Runs `build(queryName)` to completion. */
    def run(queryName: String,
        build: String => org.apache.spark.sql.streaming.DataStreamWriter[_])
        : LegResult = {
      val listener = new StateMaxListener(queryName)
      spark.streams.addListener(listener)
      try {
        val t0 = System.nanoTime()
        val q = build(queryName).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val probeEnd = graft.ContentionGate.probe(spark, 32)
        // merge the synchronous buffer: complete for ≤256-trigger legs,
        // and a floor against listener events still in flight at stop
        q.recentProgress.foreach(listener.observe)
        assert(listener.nProgress.get() > 0,
          s"$queryName produced no progress events — state maxima would be fabricated")
        val outRows = spark.table(queryName).count()
        // free the memory sink's driver-side rows before the next horizon
        spark.catalog.dropTempView(queryName)
        LegResult(wall, outRows, listener.maxRows.get(), listener.maxSst.get(),
          listener.lastBatch.get(), probeEnd, q.runId)
      } finally spark.streams.removeListener(listener)
    }

    /** Max ListState MEMBER count across SAMPLED batch snapshots, via the
      * state data source reader. `numRowsTotal` counts grouping KEYS for
      * transformWithState, so a tracker with a FIXED key space (the
      * semantic dedup tracker's 64 hyperplane buckets) is horizon-blind
      * in that metric — this reads the actual list elements per retained
      * batch snapshot instead (one row per element in the reader's
      * flattened view). Early batches may be purged past the retention
      * window; those reads are skipped. Returns (max over readable
      * snapshots, the batch ids actually read) — the row records the ids
      * so a consumer knows the peak is sampled, not exact; an
      * all-unreadable result is emitted as a distinct error field, never
      * a numeric sentinel in the members series (r12, ADVICE fix). */
    def maxListMembers(ckpt: String, stateVar: String, lastBatch: Long)
        : (Option[Long], Seq[Long]) = {
      val step = math.max(1L, lastBatch / 12)
      val ids = ((0L to lastBatch by step) :+ lastBatch).distinct
      val readable = ids.flatMap { b =>
        scala.util.Try(
          spark.read.format("statestore")
            .option("path", ckpt)
            .option("stateVarName", stateVar)
            .option("batchId", b)
            .load().count()).toOption.map(b -> _)
      }
      (readable.map(_._2).maxOption, readable.map(_._1))
    }
    def membersFields(m: (Option[Long], Seq[Long])): String = m._1 match {
      case Some(peak) =>
        s""""state_members_max_sampled":$peak,"members_sampled_batches":${m._2.mkString("[", ",", "]")}"""
      case None => s""""state_members_error":"no_readable_snapshot""""
    }
    // SPARK_GRAFT_STATE_ONLY (comma-separated probe names): re-record a
    // single contaminated leg in a calm window without paying the full
    // multi-tracker sweep — the state-curve analog of
    // SPARK_GRAFT_BENCH_ONLY. Feeds are only synthesized for probes
    // actually selected.
    val onlyProbe: String => Boolean =
      sys.env.get("SPARK_GRAFT_STATE_ONLY") match {
        case Some(v) if v.nonEmpty => v.split(",").toSet
        case _                     => _ => true
      }

    // ---- fingerprint gate: ValueState + base index -----------------------
    // feed: 2M rows, 10 ms event-time spacing (span 20,000 s), a new
    // fingerprint every 3 rows (~33 fp/s) + a 100k-fp durable base index.
    // Expected state: ~100k + horizon_s × 33 — the slope is the claim.
    if (onlyProbe("state_dedup_gate")) {
    val nFeed = 2000000L
    val dedupRows = spark.range(nFeed).select(
        col("id").as("docId"),
        concat(lit("fp"), expr("id div 3")).as("fingerprint"),
        timestamp_millis(lit(1700000000000L) + col("id") * 10L).as("ts"))
    val dedupDir = java.nio.file.Files.createTempDirectory("statecurve_fp").toString
    dedupRows.repartitionByRange(128, col("ts"))
      .write.mode("overwrite").parquet(dedupDir)
    orderFileMtimes(dedupDir)
    val dedupInit = spark.range(100000)
      .select(concat(lit("base"), col("id")).as("fp")).as[String]
      .groupByKey(identity).mapValues(_ => true)
    Seq(900000L, 1800000L, 3600000L).foreach { horizonMs =>
      val in = spark.readStream.schema(dedupRows.schema)
        .option("maxFilesPerTrigger", "1").parquet(dedupDir)
        .as[graft.streaming.DedupIn]
      val name = s"fpcurve_$horizonMs"
      val gate = graft.ContentionGate.awaitCalm(spark, 32, label = name)
      val r = run(name, n =>
        in.withWatermark("ts", "10 seconds")
          .groupByKey(_.fingerprint)
          .transformWithState(new graft.streaming.FingerprintDedupTracker(horizonMs),
            TimeMode.EventTime(), OutputMode.Append(), dedupInit)
          .writeStream.outputMode("append").format("memory").queryName(n))
      emit(f"""{"probe":"state_dedup_gate","horizon_ms":$horizonMs,"wall_sec":${r.wall}%.3f,"rows":${r.outRows},"feed_rows":$nFeed,"base_index":100000,"state_rows_max":${r.stateRowsMax},"state_sst_bytes_max":${r.sstMax},${gate.jsonFields},"probe_sec_end":${r.probeEnd},"sf":"synthetic"}""")
    }
    }

    // ---- LSH near-dup tracker: per-(band,bucket) ListState ---------------
    // feed: sf0.1 documents ×8 near-dup replicas, 100 ms spacing (span
    // 4,000 s at 10 docs/s). State rows ≈ in-horizon docs × 4 bands.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (onlyProbe("state_lsh_neardup")) {
    val docs0 = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val lshDocs = (0 until 8).map { i =>
      docs0.select((col("doc_id") * 8 + i).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionAll _)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id") * 100L))
    val nLsh = docs0.count() * 8
    val lshDir = java.nio.file.Files.createTempDirectory("statecurve_lsh").toString
    lshDocs.repartitionByRange(128, col("ts")).write.mode("overwrite").parquet(lshDir)
    orderFileMtimes(lshDir)
    Seq(600000L, 1200000L, 2400000L).foreach { horizonMs =>
      val in = spark.readStream.schema(lshDocs.schema)
        .option("maxFilesPerTrigger", "1").parquet(lshDir)
      val name = s"lshcurve_$horizonMs"
      val ckpt = java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString
      val gate = graft.ContentionGate.awaitCalm(spark, 32, label = name)
      val r = run(name, n =>
        graft.streaming.LshDedupTracker.streamInput(in)
          .as[graft.streaming.LshIn]
          .withWatermark("ts", "10 seconds")
          .groupByKey(r => s"${r.band}:${r.bandKey}")
          .transformWithState(new graft.streaming.LshDedupTracker(horizonMs),
            TimeMode.EventTime(), OutputMode.Append())
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation", ckpt).queryName(n))
      val drops = graft.streaming.AdmissionDrops.forRun(
        graft.streaming.LshDedupTracker.DropsTag, r.runId)
      val members = maxListMembers(ckpt, "bucket", r.lastBatch)
      emit(f"""{"probe":"state_lsh_neardup","horizon_ms":$horizonMs,"wall_sec":${r.wall}%.3f,"rows":${r.outRows},"feed_rows":$nLsh,"state_rows_max":${r.stateRowsMax},${membersFields(members)},"state_sst_bytes_max":${r.sstMax},"max_bucket":${graft.streaming.LshDedupTracker.DefaultMaxBucket},"admission_drops":$drops,${gate.jsonFields},"probe_sec_end":${r.probeEnd},"sf":"$sfDir"}""")
    }
    }

    // ---- semantic near-dup tracker: per-bucket ListState -----------------
    // feed: sf0.1 embeddings ×8 exact-dup replicas, 100 ms spacing.
    if (onlyProbe("state_semantic_neardup")) {
    val emb0 = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val semDocs = (0 until 8).map { i =>
      emb0.select((col("vec_id") * 8 + i).as("vec_id"), col("embedding"))
    }.reduce(_ unionAll _)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("vec_id") * 100L))
    val nSem = emb0.count() * 8
    val semDir = java.nio.file.Files.createTempDirectory("statecurve_sem").toString
    graft.streaming.SemanticDedupTracker.streamInput(semDocs)
      .repartitionByRange(128, col("ts")).write.mode("overwrite").parquet(semDir)
    orderFileMtimes(semDir)
    val semSchema = graft.streaming.SemanticDedupTracker.streamInput(semDocs).schema
    Seq(600000L, 1200000L, 2400000L).foreach { horizonMs =>
      val in = spark.readStream.schema(semSchema)
        .option("maxFilesPerTrigger", "1").parquet(semDir)
        .as[graft.streaming.SemIn]
      val name = s"semcurve_$horizonMs"
      val ckpt = java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString
      val gate = graft.ContentionGate.awaitCalm(spark, 32, label = name)
      val r = run(name, n =>
        in.withWatermark("ts", "10 seconds")
          .groupByKey(_.bucket)
          .transformWithState(new graft.streaming.SemanticDedupTracker(horizonMs),
            TimeMode.EventTime(), OutputMode.Append())
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation", ckpt).queryName(n))
      val drops = graft.streaming.AdmissionDrops.forRun(
        graft.streaming.SemanticDedupTracker.DropsTag, r.runId)
      val members = maxListMembers(ckpt, "bucket", r.lastBatch)
      emit(f"""{"probe":"state_semantic_neardup","horizon_ms":$horizonMs,"wall_sec":${r.wall}%.3f,"rows":${r.outRows},"feed_rows":$nSem,"state_rows_max":${r.stateRowsMax},${membersFields(members)},"state_sst_bytes_max":${r.sstMax},"max_bucket":${graft.streaming.SemanticDedupTracker.DefaultMaxBucket},"admission_drops":$drops,${gate.jsonFields},"probe_sec_end":${r.probeEnd},"sf":"$sfDir"}""")
    }
    }

    // ---- capped-bucket skew leg: the admission cap BINDING ----------------
    // The production default's claim under test (r12): one pathological
    // bucket — 2,000 EXACT-dup docs (same text → same signature → the
    // same key in all 4 bands) — must leave ListState bounded at
    // maxBucket members per band bucket and per-arrival emission bounded
    // at maxBucket pairs, with every refused admission counted. Uncapped,
    // arrival i emits i−1 pairs (Σ ≈ 2M pairs per bucket, state ∝ feed);
    // capped, out_rows ≈ 4 bands × (C(64,2) + 1936 × 64) and
    // state_members_max_sampled ≤ 4 × 64 however long the feed runs.
    if (onlyProbe("state_lsh_capped_bucket")) {
    val hotN = 2000L
    val hotDocs = spark.range(hotN).select(
        col("id").as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again in the same boilerplate block").as("text"))
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id") * 100L))
    val hotDir = java.nio.file.Files.createTempDirectory("statecurve_hot").toString
    hotDocs.repartitionByRange(16, col("ts")).write.mode("overwrite").parquet(hotDir)
    orderFileMtimes(hotDir)
    locally {
      val in = spark.readStream.schema(hotDocs.schema)
        .option("maxFilesPerTrigger", "1").parquet(hotDir)
      val name = "lshhotbucket"
      val ckpt = java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString
      val gate = graft.ContentionGate.awaitCalm(spark, 32, label = name)
      val cap = graft.streaming.LshDedupTracker.DefaultMaxBucket
      val r = run(name, n =>
        graft.streaming.LshDedupTracker.streamInput(in)
          .as[graft.streaming.LshIn]
          .withWatermark("ts", "10 seconds")
          .groupByKey(r => s"${r.band}:${r.bandKey}")
          .transformWithState(new graft.streaming.LshDedupTracker(3600000L),
            TimeMode.EventTime(), OutputMode.Append())
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation", ckpt).queryName(n))
      val drops = graft.streaming.AdmissionDrops.forRun(
        graft.streaming.LshDedupTracker.DropsTag, r.runId)
      val members = maxListMembers(ckpt, "bucket", r.lastBatch)
      emit(f"""{"probe":"state_lsh_capped_bucket","horizon_ms":3600000,"wall_sec":${r.wall}%.3f,"rows":${r.outRows},"feed_rows":$hotN,"state_rows_max":${r.stateRowsMax},${membersFields(members)},"state_sst_bytes_max":${r.sstMax},"max_bucket":$cap,"admission_drops":$drops,${gate.jsonFields},"probe_sec_end":${r.probeEnd},"sf":"synthetic"}""")
    }
    }

    // ---- semantic capped-bucket skew leg: the 4096 cap BINDING ------------
    // The semantic tracker's DEFAULT cap had no binding recording (r13,
    // VERDICT #5): on every real corpus drops read 0 — a pure backstop —
    // so nothing showed the backstop actually bounds state and admission
    // when a bucket saturates. Feed: hash-seeded pseudorandom dim-64
    // vectors (deterministic across runs), FILTERED to the single most
    // populated hyperplane bucket, 4096 + 904 = 5000 arrivals. Members
    // must pin at the 4096 cap with exactly 904 counted refusals; the
    // accuracy contract holds because refused arrivals still score
    // against the capped membership — random-vector pairs at cos ≥ 0.3
    // (~2.4σ of the N(0, 1/64) cosine distribution) keep out_rows > 0.
    if (onlyProbe("state_semantic_capped_bucket")) {
    val semCap = graft.streaming.SemanticDedupTracker.DefaultMaxBucket
    val nHotVecs = semCap + 904L // 5000 arrivals, 904 past the cap
    val rawVecs = spark.range(400000).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          (pmod(hash(col("id") * 64 + j), lit(2001)) - 1000).cast("double")
            / 1000.0).as("embedding"))
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("vec_id")))
    val prepped = graft.streaming.SemanticDedupTracker.streamInput(rawVecs)
    val hotBucket = prepped.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bucket")).head().getLong(0)
    val hotVecs = prepped.filter(col("bucket") === hotBucket)
      .orderBy(col("vecId")).limit(nHotVecs.toInt)
    val semHotDir = java.nio.file.Files.createTempDirectory("statecurve_semhot").toString
    hotVecs.repartitionByRange(16, col("ts")).write.mode("overwrite").parquet(semHotDir)
    orderFileMtimes(semHotDir)
    locally {
      val in = spark.readStream.schema(prepped.schema)
        .option("maxFilesPerTrigger", "1").parquet(semHotDir)
        .as[graft.streaming.SemIn]
      val name = "semhotbucket"
      val ckpt = java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString
      val gate = graft.ContentionGate.awaitCalm(spark, 32, label = name)
      val r = run(name, n =>
        in.withWatermark("ts", "10 seconds")
          .groupByKey(_.bucket)
          .transformWithState(new graft.streaming.SemanticDedupTracker(3600000L),
            TimeMode.EventTime(), OutputMode.Append())
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation", ckpt).queryName(n))
      val drops = graft.streaming.AdmissionDrops.forRun(
        graft.streaming.SemanticDedupTracker.DropsTag, r.runId)
      val members = maxListMembers(ckpt, "bucket", r.lastBatch)
      emit(f"""{"probe":"state_semantic_capped_bucket","horizon_ms":3600000,"wall_sec":${r.wall}%.3f,"rows":${r.outRows},"feed_rows":$nHotVecs,"state_rows_max":${r.stateRowsMax},${membersFields(members)},"state_sst_bytes_max":${r.sstMax},"max_bucket":$semCap,"admission_drops":$drops,${gate.jsonFields},"probe_sec_end":${r.probeEnd},"sf":"synthetic"}""")
    }
    }
  }
}
