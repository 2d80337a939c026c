package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the windowed TOP-K monitoring
  * extension (SURVEY §2.7): the validated sensor feed played through
  * [[TopKWindowTracker]] (event-time timers, 1-minute tumbling
  * windows, k = 3) across chronological micro-batches — scrambled
  * WITHIN each batch — must emit exactly the ranked row set of the
  * DuckDB-oracled batch `top_sensors_per_window` query, including the
  * avg-desc/station/sensor tie-break and the rounded averages. A
  * sentinel far-future row pushes the watermark past every real window
  * end at the finale; the sentinel's own window never closes and is
  * excluded by its window start. */
class TopKTrackerSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val WindowMs = 60L * 1000

  test("TopKWindowTracker reproduces top_sensors_per_window exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val batch = graft.queries.ParityQueries.queries("top_sensors_per_window")(spark, dir)
      .selectExpr("unix_millis(window_start) AS w_ms", "rk",
        "station_id", "sensor_id", "avg_value")
      .as[(Long, Int, String, String, Double)]
      .collect().toSet

    val feed = graft.ops.SensorOps
      .validate(graft.queries.ParityQueries.sensorShaped(spark, dir), "value_str")
      .selectExpr("unix_millis(ts) AS ts_ms", "station_id", "sensor_id",
        "value_numeric")
      .collect()
      .map { r =>
        val tsMs = r.getAs[Long]("ts_ms")
        TopKIn(tsMs - java.lang.Math.floorMod(tsMs, WindowMs),
          new Timestamp(tsMs),
          r.getAs[String]("station_id"), r.getAs[String]("sensor_id"),
          Option(r.get(r.fieldIndex("value_numeric")))
            .map(_.asInstanceOf[Double]))
      }
      .sortBy(_.ts.getTime)
    val maxWindow = feed.map(_.windowStartMs).max

    val thirds = feed.grouped((feed.length + 2) / 3).toSeq
    val rnd = new scala.util.Random(41)
    val input = MemoryStream[TopKIn]
    val ranked = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.windowStartMs)
      .transformWithState(new TopKWindowTracker(3, WindowMs),
        TimeMode.EventTime(), OutputMode.Append())
    val q = ranked.writeStream.outputMode("append")
      .format("memory").queryName("topkstream").start()
    try {
      thirds.foreach { b =>
        input.addData(rnd.shuffle(b.toSeq))
        q.processAllAvailable()
      }
      // mid-stream sanity: append-mode finalization — nothing emitted
      // that the batch query doesn't have
      val mid = spark.table("topkstream").as[TopKOut].collect()
        .map(o => (o.windowStartMs, o.rk, o.stationId, o.sensorId, o.avgValue))
        .toSet
      assert(mid.subsetOf(batch), "streamed a ranked row the batch query lacks")

      // finale: advance the watermark past every real window end
      input.addData(TopKIn(maxWindow + 1000 * WindowMs,
        new Timestamp(maxWindow + 1000 * WindowMs), "zz", "zz", Some(1.0)))
      q.processAllAvailable()

      val got = spark.table("topkstream").as[TopKOut].collect()
        .filter(_.windowStartMs <= maxWindow)
        .map(o => (o.windowStartMs, o.rk, o.stationId, o.sensorId, o.avgValue))
        .toSet
      assert(got === batch, "ranked row set != batch top_sensors_per_window")
      // timers did real work mid-stream too: earlier windows closed
      // before the finale
      assert(mid.nonEmpty, "no window closed before the finale — timers untested")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
