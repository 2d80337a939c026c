package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** K6 (consumer.py:183-208): a failing batch is logged and skipped; the
  * query stays alive and subsequent batches are processed. */
class ErrorIsolationSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("a sink failure poisons only its own batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("err_cp").toString
    val calls = new AtomicInteger(0)
    val written = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val shaped = SensorPipeline.documents(raw, "5 seconds", "10 seconds")
    val q = SensorPipeline.start(shaped, cp, Trigger.ProcessingTime("1 second")) {
      (batch, _) =>
        if (calls.incrementAndGet() == 1) sys.error("sink exploded")
        batch.select(col("metrics.count.total")).collect()
          .foreach(r => written.add(r.getLong(0)))
    }
    try {
      // batch 1 (fails in the sink): window A + advancer
      input.addData(
        SensorReading("P", "p", "1", t0 + 1000, "1.0"),
        SensorReading("P", "p", "1", t0 + 30000, "2.0"))
      q.processAllAvailable()
      assert(q.isActive, "query must survive a sink failure")
      // batch 2 (succeeds): closes window B
      input.addData(SensorReading("P", "p", "1", t0 + 60000, "3.0"))
      q.processAllAvailable()
      assert(q.isActive)
      // window A's emission was consumed by the failed batch (skip-on-error,
      // at-least-once-ish like the reference); window B arrived in batch 2
      assert(calls.get() >= 2)
      assert(written.size() === 1)
    } finally q.stop()
  }

  test("isolateFailedBatches=false: failed batch replays from checkpoint") {
    val srcDir = java.nio.file.Files.createTempDirectory("replay_src")
    val cp = java.nio.file.Files.createTempDirectory("replay_cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("replay_out").toString
    def jsonLine(offsetMs: Long, value: String): String =
      s"""{"station_name":"P","station_id":"p","sensor_id":"1","timestamp":${t0 + offsetMs},"value":"$value"}"""
    val failNext = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val raw = spark.readStream.text(srcDir.toString)
      val shaped = SensorPipeline.documents(raw, "5 seconds", "10 seconds")
      val q = SensorPipeline.start(shaped, cp, Trigger.ProcessingTime("1 second"),
        isolateFailedBatches = false) { (batch, _) =>
        if (failNext.getAndSet(false)) sys.error("sink down")
        batch.select(col("window.start").as("window_start"))
          .write.mode("append").parquet(outDir)
      }
      try q.processAllAvailable()
      catch { case _: Exception => () } // rethrow path: the query dies
      finally q.stop()
    }
    // window A + advancer; the sink fails on the batch carrying window A
    java.nio.file.Files.writeString(srcDir.resolve("f1.json"),
      Seq(jsonLine(1000, "7.0"), jsonLine(30000, "1.0")).mkString("\n"))
    failNext.set(true)
    run()
    assert(!new java.io.File(outDir).listFiles().exists(_.getName.endsWith(".parquet")),
      "failed batch must not have written")
    // restart from the same checkpoint with a healthy sink: the batch
    // REPLAYS (offsets were never committed) - genuine at-least-once,
    // unlike the default drop path asserted above
    run()
    val windows = spark.read.parquet(outDir)
      .select(col("window_start").cast("long")).collect().map(_.getLong(0)).toSeq
    assert(windows === Seq(t0 / 1000), s"expected replayed window A, got $windows")
  }

  test("idempotent sink + replay = exactly-once: batchId partition overwrite") {
    // The end-to-end exactly-once recipe: rethrow-on-failure (at-least-once
    // replay, previous test) + FanOut.writePartitionedIdempotent, whose
    // batchId-keyed dynamic partition overwrite makes Spark's same-batchId
    // replay replace the partial partition instead of appending a
    // duplicate.
    val srcDir = java.nio.file.Files.createTempDirectory("idem_src")
    val cp = java.nio.file.Files.createTempDirectory("idem_cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("idem_out").toString
    def jsonLine(offsetMs: Long, value: String): String =
      s"""{"station_name":"P","station_id":"p","sensor_id":"1","timestamp":${t0 + offsetMs},"value":"$value"}"""
    val failAfterWrite = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val raw = spark.readStream.text(srcDir.toString)
      val shaped = SensorPipeline.documents(raw, "5 seconds", "10 seconds")
      val q = SensorPipeline.start(shaped, cp, Trigger.ProcessingTime("1 second"),
        isolateFailedBatches = false) { (batch, batchId) =>
        graft.ops.FanOut.writePartitionedIdempotent(
          batch.select(col("station.id").as("station_id"),
            col("window.start").as("window_start")),
          outDir, batchId)
        if (failAfterWrite.getAndSet(false)) sys.error("crash AFTER the write")
      }
      try q.processAllAvailable()
      catch { case _: Exception => () }
      finally q.stop()
    }
    java.nio.file.Files.writeString(srcDir.resolve("f1.json"),
      Seq(jsonLine(1000, "7.0"), jsonLine(30000, "1.0")).mkString("\n"))
    failAfterWrite.set(true)
    run() // batch writes window A, then dies before committing offsets
    run() // replay: same batchId -> overwrite, not append
    val windows = spark.read.parquet(outDir)
      .select(col("window_start").cast("long")).collect().map(_.getLong(0)).toSeq
    assert(windows === Seq(t0 / 1000),
      s"replay must overwrite its own partition, got $windows")
    // station-major layout: reading station_id=p/ yields that station's
    // history — the fan-out read contract survives the idempotence keying
    assert(new java.io.File(outDir, "station_id=p").isDirectory)
  }
}
