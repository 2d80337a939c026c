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

  /** Ranked-set equality with a 1-ulp-at-6dp tolerance on the average:
    * the tracker divides a correctly-rounded EXACT sum while the batch
    * avg accumulates doubles in partition order, so at a 6-dp HALF_UP
    * rounding boundary the two may differ by 1e-6 (tracker scaladoc).
    * Keys (window, rank, station, sensor) still compare exactly. */
  private type Ranked = (Long, Int, String, String, Double)
  def assertRankedEqual(got: Set[Ranked], want: Set[Ranked], hint: String): Unit = {
    def keys(s: Set[Ranked]) = s.map { case (w, rk, st, sn, _) => (w, rk, st, sn) }
    assert(keys(got) === keys(want), s"$hint: ranked keys differ")
    val gotAvg = got.map { case (w, rk, st, sn, a) => (w, rk, st, sn) -> a }.toMap
    want.foreach { case (w, rk, st, sn, a) =>
      assert(math.abs(gotAvg((w, rk, st, sn)) - a) <= 1e-6 + 1e-12,
        s"$hint: avg off by >1e-6 at ($w,$rk,$st,$sn)")
    }
  }

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
      val batchKeys = batch.map { case (w, rk, st, sn, _) => (w, rk, st, sn) }
      assert(mid.forall { case (w, rk, st, sn, _) => batchKeys((w, rk, st, sn)) },
        "streamed a ranked row the batch query lacks")

      // finale: advance the watermark past every real window end
      input.addData(TopKIn(maxWindow + 1000 * WindowMs,
        new Timestamp(maxWindow + 1000 * WindowMs), "zz", "zz", Some(1.0)))
      q.processAllAvailable()

      val got = spark.table("topkstream").as[TopKOut].collect()
        .filter(_.windowStartMs <= maxWindow)
        .map(o => (o.windowStartMs, o.rk, o.stationId, o.sensorId, o.avgValue))
        .toSet
      assertRankedEqual(got, batch, "batch top_sensors_per_window")
      // timers did real work mid-stream too: earlier windows closed
      // before the finale
      assert(mid.nonEmpty, "no window closed before the finale — timers untested")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
