package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Backfill mode: Trigger.AvailableNow drains everything already in the
  * source (in rate-limited micro-batches) and stops on its own — the
  * pattern for replaying history through the SAME streaming pipeline that
  * serves live data, instead of maintaining a parallel batch job. */
class AvailableNowSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("AvailableNow drains the backlog and terminates") {
    val src = Files.createTempDirectory("an_src")
    val cp = Files.createTempDirectory("an_cp").toString
    def line(sensor: String, off: Long, v: String) =
      s"""{"station_name":"P","station_id":"p","sensor_id":"$sensor","timestamp":${t0 + off},"value":"$v"}"""
    Files.writeString(src.resolve("backlog.json"),
      Seq(line("1", 1000, "5.0"), line("1", 2000, "<<bad_data>>"),
        line("1", 30000, "6.0"), line("1", 61000, "7.0")).mkString("\n"))

    val raw = spark.readStream.text(src.toString)
    val q = SensorPipeline
      .documents(raw, watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("memory").queryName("an_docs")
      .trigger(Trigger.AvailableNow())
      .start()
    // AvailableNow terminates by itself once the backlog is drained
    assert(q.awaitTermination(60000), "query did not self-terminate")
    val rows = spark.table("an_docs")
      .selectExpr("metrics.count.total", "metrics.count.malformed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // windows [t0,+10s) {2 rows, 1 malformed} and [t0+30s,+40s) {1 row}
    // finalized; the t0+61s window stays open past the watermark
    assert(rows.toSeq === Seq((1L, 0L), (2L, 1L)))
  }
}
