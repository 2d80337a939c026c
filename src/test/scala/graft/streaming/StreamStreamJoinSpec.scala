package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Stream-stream interval join: purchases matched to the clicks that
  * preceded them within 10 minutes, both sides watermarked so join state
  * is bounded (the scale requirement: unwatermarked stream-stream joins
  * grow state without limit). */
case class Click(user_id: Long, click_ts: Timestamp)
case class Purchase(user_id: Long, purchase_ts: Timestamp)

class StreamStreamJoinSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L
  private def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  test("interval join matches purchases to recent clicks only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = clicks.toDS().withWatermark("click_ts", "1 minute").as("clicks")
      .join(
        purchases.toDS().withWatermark("purchase_ts", "1 minute").as("purchases"),
        expr("""clicks.user_id = purchases.user_id AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 10 minutes""".stripMargin))
      .select(col("clicks.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cp").start()
    try {
      clicks.addData(Click(1, ts(0)), Click(2, ts(0)))
      purchases.addData(Purchase(1, ts(300)))   // 5 min after click: match
      purchases.addData(Purchase(2, ts(6000)))  // 100 min after: no match
      q.processAllAvailable()
      val rows = spark.table("cp").select(col("user_id")).collect().map(_.getLong(0))
      assert(rows.toSeq === Seq(1L))
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = clicks.toDS().withWatermark("click_ts", "10 seconds").as("c")
      .join(
        purchases.toDS().withWatermark("purchase_ts", "10 seconds").as("p"),
        expr("""c.user_id = p.user_id AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 30 seconds""".stripMargin),
        "left_outer")
      .select(col("c.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cp_outer").start()
    try {
      clicks.addData(Click(1, ts(0)), Click(2, ts(0)))
      purchases.addData(Purchase(1, ts(5))) // user 1 converts; user 2 doesn't
      q.processAllAvailable()
      // matched row can emit immediately; the NULL row for user 2 must
      // wait until the watermark proves no purchase can still arrive
      clicks.addData(Click(9, ts(120)))          // advance click watermark
      purchases.addData(Purchase(9, ts(121)))    // advance purchase watermark
      q.processAllAvailable()
      val rows = spark.table("cp_outer")
        .filter(col("user_id").isin(1L, 2L))
        .collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
      assert(rows(1L).isDefined, "matched click must carry its purchase")
      assert(rows(2L).isEmpty, "unmatched click must emit with NULL purchase")
    } finally q.stop()
  }
}
