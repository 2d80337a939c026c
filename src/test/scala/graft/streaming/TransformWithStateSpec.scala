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
}
