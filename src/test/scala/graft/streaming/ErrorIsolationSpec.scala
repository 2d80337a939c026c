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
}
