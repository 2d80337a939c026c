package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** The windowed pipeline must run unchanged on the RocksDB state store —
  * the provider that keeps executor-heap state off-heap at scale (large
  * key cardinality × windows-in-flight). */
class RocksDBStateSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("windowed aggregation on RocksDBStateStoreProvider") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val q = SensorPipeline
      .documents(raw, watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("rocks_docs")
      .start()
    try {
      input.addData(
        SensorReading("P", "p", "1", t0 + 1000, "10.0"),
        SensorReading("P", "p", "1", t0 + 2000, "<<bad_data>>"))
      q.processAllAvailable()
      input.addData(SensorReading("P", "p", "1", t0 + 30000, "1.0"))
      q.processAllAvailable()
      val row = spark.table("rocks_docs")
        .select(col("metrics.count.total"), col("metrics.count.malformed"),
          col("metrics.avg_value"))
        .head()
      assert(row.getLong(0) === 2L)
      assert(row.getLong(1) === 1L)
      assert(row.getDouble(2) === 10.0)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
