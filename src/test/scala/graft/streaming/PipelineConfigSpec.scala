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

  test("fromEnv honors the reference's env names and tumbling default") {
    // the ACTUAL env var names a MASD deployment sets (.env:13-17,
    // consumer.py:31-35 os.getenv) — SPARK_AGGREGATE_*
    val cfg = PipelineConfig.fromEnv(Map(
      "SPARK_AGGREGATE_WINDOW" -> "2 minutes",
      "SPARK_AGGREGATE_SLIDE" -> "2 minutes", // slide == window → tumbling (None)
      "SPARK_AGGREGATE_WATERMARK" -> "10 seconds",
      "SPARK_AGGREGATE_TRIGGER_INTERVAL" -> "30 seconds",
      "SPARK_AGGREGATE_CHECKPOINT_DIR" -> "/tmp/cp1"))
    assert(cfg.windowDuration === "2 minutes")
    assert(cfg.slideDuration === None)
    assert(cfg.watermarkDelay === "10 seconds")
    assert(cfg.triggerInterval === "30 seconds")
    assert(cfg.checkpointDir === "/tmp/cp1")
    assert(PipelineConfig.fromEnv(Map.empty) === PipelineConfig())
    val sliding = PipelineConfig.fromEnv(Map(
      "SPARK_AGGREGATE_WINDOW" -> "2 minutes", "SPARK_AGGREGATE_SLIDE" -> "1 minute"))
    assert(sliding.slideDuration === Some("1 minute"))
    // primary names win over the short-name fallback
    val precedence = PipelineConfig.fromEnv(Map(
      "SPARK_AGGREGATE_WINDOW" -> "3 minutes", "WINDOW_DURATION" -> "9 minutes"))
    assert(precedence.windowDuration === "3 minutes")
    // short names still honored when the primaries are absent
    val fallback = PipelineConfig.fromEnv(Map(
      "WINDOW_DURATION" -> "4 minutes", "CHECKPOINT_DIR" -> "/tmp/cp2"))
    assert(fallback.windowDuration === "4 minutes")
    assert(fallback.checkpointDir === "/tmp/cp2")
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
