package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** The DLQ upgrade over the reference's count-only malformed handling:
  * invalid payloads are preserved verbatim in an audit location. */
class MalformedAuditSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("malformed rows land in the audit sink with payloads intact") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val audit = java.nio.file.Files.createTempDirectory("dlq_out").toString
    val cp = java.nio.file.Files.createTempDirectory("dlq_cp").toString
    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val q = SensorPipeline.startMalformedAudit(
      SensorPipeline.fromRawJson(raw), audit, cp, Trigger.ProcessingTime("1 second"))
    try {
      input.addData(
        SensorReading("P", "p", "1", t0, "10.5"),
        SensorReading("P", "p", "2", t0 + 1000, "<<bad_data>>"),
        SensorReading("P", "p", "3", t0 + 2000, "not-a-number"),
        SensorReading("P", "p", "4", t0 + 3000, "11.0"))
      q.processAllAvailable()
      val rows = spark.read.parquet(audit)
        .select("sensor_id", "value").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows === Map("2" -> "<<bad_data>>", "3" -> "not-a-number"))
    } finally q.stop()
  }
}
