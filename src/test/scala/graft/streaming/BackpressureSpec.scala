package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Ingestion pacing: maxFilesPerTrigger bounds each micro-batch's input —
  * the knob that keeps a backfill from loading an entire landing zone in
  * one batch (state/memory spike) at scale. */
class BackpressureSpec extends AnyFunSuite with SparkSpec {

  test("maxFilesPerTrigger=1 processes one file per micro-batch") {
    val src = Files.createTempDirectory("bp_src")
    val cp = Files.createTempDirectory("bp_cp").toString
    (1 to 3).foreach { i =>
      Files.writeString(src.resolve(s"f$i.txt"), s"line$i")
    }
    val batches = new AtomicInteger(0)
    val rows = new AtomicInteger(0)
    val q = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(src.toString)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count().toInt
        if (n > 0) { batches.incrementAndGet(); rows.addAndGet(n) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(rows.get() === 3, "all files must eventually be ingested")
      assert(batches.get() === 3, s"expected 3 single-file batches, got ${batches.get()}")
    } finally q.stop()
  }
}
