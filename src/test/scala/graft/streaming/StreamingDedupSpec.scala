package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

case class Reading(sensor_id: String, ts: Timestamp, value: Double)

/** Streaming exact dedup: `dropDuplicatesWithinWatermark` keys state by the
  * dedup columns and expires it with the watermark — the streaming face of
  * the dedup tier (bounded state, unlike a batch distinct). */
class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L
  private def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  test("duplicate readings within the watermark are emitted once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Reading]
    val deduped = input.toDS()
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("sensor_id", "ts")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      // at-least-once upstream: the same reading delivered 3 times
      input.addData(Reading("s1", ts(0), 10.0), Reading("s1", ts(0), 10.0))
      q.processAllAvailable()
      input.addData(Reading("s1", ts(0), 10.0), Reading("s1", ts(5), 11.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").as[Reading].collect()
      assert(rows.length === 2) // one per distinct (sensor, ts)
      assert(rows.map(_.ts.getTime).sorted.toSeq === Seq(t0, t0 + 5000))
    } finally q.stop()
  }
}
