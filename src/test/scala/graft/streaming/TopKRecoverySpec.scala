package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** W5 for the timer-based top-k tracker: MapState partials AND the
  * armed event-time timers must survive a checkpoint restart. Run 1
  * closes the first window and leaves a half-accumulated second window
  * in state; run 2 (same checkpoint, new file) adds more rows to that
  * window — the restored (sum, count) partials must merge with them —
  * and the advancing watermark must fire the RESTORED timer, emitting
  * each window exactly once across both runs with the correct ranking. */
class TopKRecoverySpec extends AnyFunSuite with SparkSpec {

  private val base = 1700000040000L // minute-aligned: windows snap to epoch minutes
  private val WinMs = 60L * 1000

  test("TopKWindowTracker state and timers survive checkpoint restart") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("topk_src")
    val cpDir = Files.createTempDirectory("topk_cp").toString
    val outDir = Files.createTempDirectory("topk_out").toString

    def addFile(name: String, rows: Seq[(Long, String, String, Double)]): Unit =
      Files.writeString(srcDir.resolve(name),
        rows.map { case (t, st, sn, v) => s"${base + t},$st,$sn,$v" }.mkString("\n"))

    def run(): Unit = {
      val winMs = WinMs // local copy: the map closure must not capture the suite
      val ds = spark.readStream
        .schema("ts_ms LONG, station STRING, sensor STRING, v DOUBLE")
        .csv(srcDir.toString)
        .as[(Long, String, String, Double)]
        .map { case (t, st, sn, v) =>
          TopKIn(t - java.lang.Math.floorMod(t, winMs),
            new java.sql.Timestamp(t), st, sn, Some(v))
        }
        .withWatermark("ts", "10 seconds")
        .groupByKey(_.windowStartMs)
        .transformWithState(new TopKWindowTracker(3, WinMs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = ds.writeStream
        .option("checkpointLocation", cpDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TopKOut], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: window W0 [0, 60s) fully fed; W1 [60s, 120s) half-fed; the
    // 90s row advances the watermark to 80s, closing W0 only
    addFile("f1.csv", Seq(
      (1000L, "a", "x", 10.0), (2000L, "a", "x", 20.0), // W0: avg 15
      (3000L, "b", "y", 5.0),                           // W0: avg 5
      (90000L, "a", "x", 7.0)))                         // W1 partial
    run()
    val afterRun1 = spark.read.parquet(outDir).as[TopKOut].collect()
      .map(o => (o.windowStartMs - base, o.rk, o.stationId, o.sensorId, o.avgValue))
      .toSet
    assert(afterRun1 === Set(
      (0L, 1, "a", "x", 15.0),
      (0L, 2, "b", "y", 5.0)), "run 1 must close exactly W0")

    // run 2 from the same checkpoint: a NEW row lands in W1 (merges with
    // the restored partial), W2 gets a row, and the 300s advancer pushes
    // the watermark past both ends — the restored timer must fire
    addFile("f2.csv", Seq(
      (95000L, "a", "z", 3.0),   // W1: second sensor, above restored wm 80s
      (121000L, "b", "y", 9.0),  // W2
      (300000L, "c", "c", 1.0))) // advancer (its own window stays open)
    run()
    val afterRun2 = spark.read.parquet(outDir).as[TopKOut].collect()
      .map(o => (o.windowStartMs - base, o.rk, o.stationId, o.sensorId, o.avgValue))
      .toSet
    assert(afterRun2 === afterRun1 ++ Set(
      (60000L, 1, "a", "x", 7.0),
      (60000L, 2, "a", "z", 3.0),
      (120000L, 1, "b", "y", 9.0)),
      "restored state must merge with new rows; no window re-emits")
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
