package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** The reference's env contract (.env:13-17) and the config-driven
  * assembly, including SLIDING windows through the streaming path. */
class PipelineConfigSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("fromEnv honors the reference's variables and tumbling default") {
    val cfg = PipelineConfig.fromEnv(Map(
      "WINDOW_DURATION" -> "2 minutes",
      "SLIDE_DURATION" -> "2 minutes", // slide == window → tumbling (None)
      "WATERMARK_DELAY" -> "10 seconds",
      "TRIGGER_INTERVAL" -> "30 seconds",
      "CHECKPOINT_DIR" -> "/tmp/cp1"))
    assert(cfg.windowDuration === "2 minutes")
    assert(cfg.slideDuration === None)
    assert(cfg.watermarkDelay === "10 seconds")
    assert(PipelineConfig.fromEnv(Map.empty) === PipelineConfig())
    val sliding = PipelineConfig.fromEnv(Map(
      "WINDOW_DURATION" -> "2 minutes", "SLIDE_DURATION" -> "1 minute"))
    assert(sliding.slideDuration === Some("1 minute"))
  }

  test("sliding windows through the streaming path: one event, two windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cfg = PipelineConfig(
      windowDuration = "10 seconds", slideDuration = Some("5 seconds"),
      watermarkDelay = "5 seconds")
    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val q = SensorPipeline.documents(raw, cfg)
      .writeStream.outputMode("append")
      .format("memory").queryName("sliding_docs").start()
    try {
      // one event at t0+6s sits in windows [t0, +10) and [t0+5, +15)
      input.addData(SensorReading("P", "p", "1", t0 + 6000, "4.0"))
      input.addData(SensorReading("P", "p", "1", t0 + 60000, "1.0")) // advance
      q.processAllAvailable()
      val windows = spark.table("sliding_docs")
        .where(col("metrics.avg_value") === 4.0)
        .select(col("window.start").cast("long")).collect().map(_.getLong(0)).sorted
      assert(windows.toSeq === Seq(t0 / 1000, t0 / 1000 + 5))
    } finally q.stop()
  }
}
