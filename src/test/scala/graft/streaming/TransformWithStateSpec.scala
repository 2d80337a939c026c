package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** transformWithState (Spark 4 arbitrary-state API): per-key ValueState
  * persists across micro-batches, on the RocksDB provider it requires. */
class TransformWithStateSpec extends AnyFunSuite with SparkSpec {

  test("PeakTracker: per-station peak persists and updates across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Double)]
    val peaks = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new PeakTracker, TimeMode.None(), OutputMode.Update())
      .toDF("station", "peak", "is_new_peak")
    val q = peaks.writeStream.outputMode("update")
      .format("memory").queryName("peaks").start()
    try {
      input.addData(("p", 10.0), ("p", 12.0), ("t", 5.0))
      q.processAllAvailable()
      input.addData(("p", 11.0), ("t", 7.0)) // p: below peak; t: new peak
      q.processAllAvailable()
      val rows = spark.table("peaks")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
        .toSeq
      // batch 1: both stations set fresh peaks
      assert(rows.contains(("p", 12.0, true)))
      assert(rows.contains(("t", 5.0, true)))
      // batch 2: p keeps 12.0 (not a new peak), t raises to 7.0
      assert(rows.contains(("p", 12.0, false)))
      assert(rows.contains(("t", 7.0, true)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("EwmaTracker: recursive smoothing matches the reference fold across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long, Double)]
    val smoothed = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new EwmaTracker(0.5), TimeMode.None(), OutputMode.Append())
      .toDF("station", "ts", "v", "ewma")
    val q = smoothed.writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    try {
      // batch 1 delivered OUT of ts order — the tracker must fold by ts
      input.addData(("s", 2L, 20.0), ("s", 1L, 10.0), ("u", 1L, 4.0))
      q.processAllAvailable()
      // batch 2 continues from persisted state
      input.addData(("s", 3L, 40.0), ("u", 2L, 8.0))
      q.processAllAvailable()
      val got = spark.table("ewma_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
      // reference fold, alpha = 0.5, event-time order
      assert(got(("s", 1L)) === 10.0)                 // seed
      assert(got(("s", 2L)) === 0.5 * 20.0 + 0.5 * 10.0)
      assert(got(("s", 3L)) === 0.5 * 40.0 + 0.5 * got(("s", 2L)))
      assert(got(("u", 1L)) === 4.0)
      assert(got(("u", 2L)) === 0.5 * 8.0 + 0.5 * 4.0)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
