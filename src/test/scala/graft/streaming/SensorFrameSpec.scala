package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the MapState sensor-frame enrichment:
  * the tagged feed played through [[SensorFrameTracker]] across three
  * scrambled micro-batches must stamp every error with exactly the
  * per-sensor latest-reading frame a first-principles chronological
  * replay produces — per (error, sensor) bit-for-bit, including the
  * max-eventId tiebreak at duplicate timestamps and the reading-first
  * rule at an exact error-timestamp tie. */
class SensorFrameSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SensorFrameTracker matches a chronological batch replay exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val ev = graft.sources.Tables.events(spark, dir)
    val rd = ev.where("event_type <> 'error' AND value IS NOT NULL")
      .selectExpr("CAST(user_id AS STRING) AS user_id",
        "unix_micros(ts) AS ts_us", "0 AS tag", "event_id",
        "event_type AS sensor_id",
        "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS LONG) AS v_micro")
    val er = ev.where("event_type = 'error'")
      .selectExpr("CAST(user_id AS STRING) AS user_id",
        "unix_micros(ts) AS ts_us", "1 AS tag", "event_id",
        "'' AS sensor_id", "CAST(0 AS LONG) AS v_micro")
    val feed = rd.unionByName(er)
      .as[(String, Long, Int, Long, String, Long)]
      .collect()
      .map(r => AsofIn(r._1, r._2, r._3, r._4, r._5, r._6))
      .sortBy(r => (r.tsUs, r.tag, r.eventId))

    // first-principles replay: fold the globally-ordered feed per user
    val expected = scala.collection.mutable.Set.empty[(Long, String, Long, String, Long, Long, Long)]
    val state = scala.collection.mutable.Map.empty[(String, String), (Long, Long, Long)]
    feed.foreach { r =>
      if (r.tag == 0) {
        val k = (r.userId, r.sensorId)
        val adv = state.get(k)
          .forall(c => r.tsUs > c._1 || (r.tsUs == c._1 && r.eventId > c._2))
        if (adv) state(k) = (r.tsUs, r.eventId, r.vMicro)
      } else {
        state.collect { case ((u, sid), (rTs, _, v)) if u == r.userId =>
          expected += ((r.eventId, u, r.tsUs, sid, rTs, v, r.tsUs - rTs))
        }
      }
    }

    val thirds = feed.grouped((feed.length + 2) / 3).toSeq
    val rnd = new scala.util.Random(31)
    val input = MemoryStream[AsofIn]
    val frames = input.toDS()
      .groupByKey(_.userId)
      .transformWithState(new SensorFrameTracker, TimeMode.None(), OutputMode.Append())
    val q = frames.writeStream.outputMode("append")
      .format("memory").queryName("framestream").start()
    try {
      thirds.foreach { b =>
        input.addData(rnd.shuffle(b.toSeq))
        q.processAllAvailable()
      }
      val got = spark.table("framestream").as[FrameOut].collect()
        .map(o => (o.errorId, o.userId, o.errorTsUs, o.sensorId,
          o.rTsUs, o.vMicro, o.gapUs)).toSet
      assert(got.size === spark.table("framestream").count(),
        "duplicate frame rows emitted")
      assert(got === expected.toSet)
      // multi-sensor frames are actually exercised: some error carries
      // more than one sensor row
      val multis = got.groupBy(t => (t._1)).count(_._2.size > 1)
      assert(multis > 0, "fixture never produced a multi-sensor frame")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a late cross-batch error omits slots carrying future readings") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // per-slot twin of the AsofTracker late-error guard: sensor b's
    // carried reading (ts 300) is in the late error's future (ts 200),
    // so the frame row for b is omitted; sensor a (ts 100) qualifies
    val input = MemoryStream[AsofIn]
    val frames = input.toDS()
      .groupByKey(_.userId)
      .transformWithState(new SensorFrameTracker, TimeMode.None(), OutputMode.Append())
    val q = frames.writeStream.outputMode("append")
      .format("memory").queryName("framelate").start()
    try {
      input.addData(
        AsofIn("u", 100L, 0, 1L, "a", 5L),
        AsofIn("u", 300L, 0, 2L, "b", 9L))
      q.processAllAvailable()
      input.addData(AsofIn("u", 200L, 1, 3L, "", 0L)) // LATE error @200
      q.processAllAvailable()
      val got = spark.table("framelate").as[FrameOut].collect()
        .map(o => (o.sensorId, o.rTsUs, o.gapUs)).toSet
      assert(got === Set(("a", 100L, 100L)),
        s"late error must see only at-or-before slots, got $got")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
