package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** In-flight observed metrics: per-batch row/malformed counts surfaced via
  * QueryProgressEvent with no extra pass over the data. */
class ObserveMetricsSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("observe surfaces per-batch malformed counts to the listener") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val seen = mutable.Buffer.empty[(Long, Long)] // (n_rows, n_malformed)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("sensor_metrics")) {
          val row = m.get("sensor_metrics")
          seen += ((row.getLong(0), row.getLong(1)))
        }
      }
    }
    spark.streams.addListener(listener)

    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val validated = SensorPipeline.withBatchMetrics(SensorPipeline.fromRawJson(raw))
    val q = validated.writeStream.outputMode("append")
      .format("memory").queryName("observed").start()
    try {
      input.addData(
        SensorReading("P", "p", "1", t0, "10.0"),
        SensorReading("P", "p", "1", t0 + 1000, "<<bad_data>>"),
        SensorReading("P", "p", "2", t0 + 2000, "7.5"))
      q.processAllAvailable()
      // listener events are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.nonEmpty, "no observed metrics delivered")
      assert(seen.head === ((3L, 1L)))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
