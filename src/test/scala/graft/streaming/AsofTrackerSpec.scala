package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the AS-OF join: the raw tagged event
  * feed played through `AsofTracker` across three micro-batches
  * (scrambled WITHIN each batch — the tracker must re-apply the carry
  * order) must reproduce the DuckDB-ASOF-oracled batch
  * `error_asof_reading` output bit-for-bit, including null reading
  * columns for never-heard-from users and exact microsecond gaps. This
  * completes the enrichment family's batch/stream symmetry: the
  * interval join has [[IntervalJoin]] + `StreamStreamJoinSpec`; the
  * as-of carry has this. */
class AsofTrackerSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("AsofTracker reproduces error_asof_reading exactly across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // the oracled batch result, keyed by error_id
    val batch = graft.queries.TimeSeriesQueries.errorAsofReading(spark, dir)
      .selectExpr("error_id", "CAST(user_id AS STRING) AS user_id",
        "unix_micros(error_ts) AS error_ts_us",
        "sensor_id", "unix_micros(r_ts) AS r_ts_us", "v_micro", "gap_us")
      .collect()
      .map(r => r.getAs[Long]("error_id") -> (
        r.getAs[String]("user_id"),
        r.getAs[Long]("error_ts_us"),
        Option(r.getAs[String]("sensor_id")),
        Option(r.get(r.fieldIndex("r_ts_us"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("v_micro"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("gap_us"))).map(_.asInstanceOf[Long])))
      .toMap

    // the same tagged feed the batch query unions, as raw AsofIn rows
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
      // global carry order, then chronological thirds: a same-ts
      // reading/error pair can straddle a boundary only reading-first,
      // which is the correct apply order
      .sortBy(r => (r.tsUs, r.tag, r.eventId))

    val thirds = feed.grouped((feed.length + 2) / 3).toSeq
    val rnd = new scala.util.Random(17)
    val input = MemoryStream[AsofIn]
    val enriched = input.toDS()
      .groupByKey(_.userId)
      .transformWithState(new AsofTracker, TimeMode.None(), OutputMode.Append())
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asofstream").start()
    try {
      thirds.foreach { b =>
        input.addData(rnd.shuffle(b.toSeq))
        q.processAllAvailable()
      }
      val got = spark.table("asofstream").as[AsofOut].collect()
        .map(o => o.errorId ->
          (o.userId, o.errorTsUs, o.sensorId, o.rTsUs, o.vMicro, o.gapUs))
        .toMap
      assert(got.size === batch.size, "row-count mismatch vs batch as-of")
      batch.foreach { case (errorId, exp) =>
        assert(got.get(errorId).contains(exp), s"mismatch at error_id=$errorId")
      }
      // the LEFT semantics are actually exercised: some errors precede
      // any reading from their user
      assert(batch.values.exists(_._3.isEmpty),
        "fixture lost its no-prior-reading errors — LEFT leg untested")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a late cross-batch error degrades to LEFT nulls, never a negative gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TimeMode.None has no lateness bound: an error can arrive in a
    // later micro-batch with tsUs OLDER than the carried reading. The
    // O(1) state cannot answer it exactly — it must emit the LEFT null
    // columns, not stamp the future reading with a negative gap.
    val input = MemoryStream[AsofIn]
    val enriched = input.toDS()
      .groupByKey(_.userId)
      .transformWithState(new AsofTracker, TimeMode.None(), OutputMode.Append())
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asoflate").start()
    try {
      input.addData(
        AsofIn("u", 100L, 0, 1L, "a", 5L), // reading @100
        AsofIn("u", 150L, 1, 2L, "", 0L))  // error   @150 → gap 50
      q.processAllAvailable()
      input.addData(AsofIn("u", 200L, 0, 3L, "b", 9L)) // carry → @200
      q.processAllAvailable()
      input.addData(
        AsofIn("u", 180L, 1, 4L, "", 0L),  // LATE error: carry @200 > 180
        AsofIn("u", 250L, 1, 5L, "", 0L))  // on-time error → gap 50
      q.processAllAvailable()
      val got = spark.table("asoflate").as[AsofOut].collect()
        .map(o => o.errorId -> o).toMap
      assert(got(2L) === AsofOut(2L, "u", 150L, Some("a"), Some(100L), Some(5L), Some(50L)))
      assert(got(4L) === AsofOut(4L, "u", 180L, None, None, None, None),
        "late error must see LEFT nulls, not the future reading")
      assert(got(5L) === AsofOut(5L, "u", 250L, Some("b"), Some(200L), Some(9L), Some(50L)))
      assert(!got.values.exists(_.gapUs.exists(_ < 0)), "negative gap emitted")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
