package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Chained stateful aggregations in ONE streaming query (Spark 4 /
  * 3.4+): fine 10s windows re-aggregated into coarse 30s windows via
  * window_time(), both stateful, single pipeline. The classic rollup
  * cascade (minute → hour → day) without intermediate sinks — at scale
  * this halves the storage round-trips a two-job cascade pays. */
class ChainedAggregationSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000010000L // 1700000010 % 30 == 0: 30s-aligned

  test("fine windows re-aggregate into coarse windows in one query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val fine = input.toDS().toDF("station", "ms", "v")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("station"))
      .agg(sum(col("v")).as("v_sum"), count(lit(1)).as("n"))
    val coarse = fine
      .groupBy(window(window_time(col("window")), "30 seconds"))
      .agg(sum(col("v_sum")).as("v_total"), sum(col("n")).as("n_total"))
      .select(col("window.start").cast("long").as("start_s"),
        col("v_total"), col("n_total"))
    val q = coarse.writeStream.outputMode("append")
      .format("memory").queryName("coarse_windows").start()
    try {
      // three fine windows inside one 30s coarse window
      input.addData(("p", t0 + 1000, 1.0), ("p", t0 + 11000, 2.0), ("p", t0 + 21000, 4.0))
      q.processAllAvailable()
      // advancer: watermark must clear BOTH the fine windows and the
      // coarse window end before anything appears
      input.addData(("p", t0 + 120000, 100.0))
      q.processAllAvailable()
      val rows = spark.table("coarse_windows")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(rows === Seq((t0 / 1000, 7.0, 3L)), s"got $rows")
    } finally q.stop()
  }
}
