package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** W5 (checkpointing) and stream-static enrichment: semantics only a
  * running streaming query can demonstrate. */
class RecoverySpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  private def jsonLine(sensor: String, offsetMs: Long, value: String): String =
    s"""{"station_name":"Perugia","station_id":"perugia","sensor_id":"$sensor","timestamp":${t0 + offsetMs},"value":"$value"}"""

  test("checkpoint recovery: no re-emission, processing resumes after restart") {
    val srcDir = Files.createTempDirectory("rec_src")
    val cpDir = Files.createTempDirectory("rec_cp").toString
    def addFile(name: String, lines: Seq[String]): Path =
      Files.writeString(srcDir.resolve(name), lines.mkString("\n"))

    val outDir = Files.createTempDirectory("rec_out").toString
    def run(): Unit = {
      val raw = spark.readStream.text(srcDir.toString) // column "value"
      val shaped = SensorPipeline
        .documents(raw, watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      // the real sink path (K1): foreachBatch appending finalized windows
      val q = SensorPipeline.start(shaped, cpDir,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second")) {
        (batch, _) =>
          batch.select(col("window.start").as("window_start"),
            col("station.id").as("station_id"), col("sensor.id").as("sensor_id"),
            col("metrics.count.total").as("total"))
            .write.mode("append").parquet(outDir)
      }
      try q.processAllAvailable() finally q.stop()
    }
    def emittedWindows(): Seq[Long] =
      spark.read.parquet(outDir).select(col("window_start").cast("long"))
        .collect().map(_.getLong(0)).toSeq.sorted

    // run 1: window A [t0, t0+10s) + advancer that finalizes it
    addFile("f1.json", Seq(
      jsonLine("1", 1000, "10.0"), jsonLine("1", 2000, "30.0"), jsonLine("1", 30000, "1.0")))
    run()
    assert(emittedWindows() === Seq(t0 / 1000)) // window A exactly once

    // run 2 from the same checkpoint: new file closes window B
    addFile("f2.json", Seq(jsonLine("1", 60000, "2.0")))
    run()
    // window A NOT re-emitted; window B ([t0+30s,+40s)) appended once
    assert(emittedWindows() === Seq(t0 / 1000, t0 / 1000 + 30))
  }

  test("stream-static broadcast enrichment join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stations = Seq(("perugia", "umbria"), ("terni", "umbria"), ("milano", "lombardia"))
      .toDF("station_id", "region")
    val input = MemoryStream[SensorReading]
    val enriched = input.toDS()
      .join(broadcast(stations), Seq("station_id"), "left")
      .select(col("station_id"), col("sensor_id"), col("value"), col("region"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      input.addData(
        SensorReading("Perugia", "perugia", "1", t0, "10.0"),
        SensorReading("Nowhere", "atlantis", "9", t0, "20.0"))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getString(0) -> Option(r.getString(3))).toMap
      assert(rows("perugia") === Some("umbria"))
      assert(rows("atlantis") === None) // left join keeps unmatched streams
    } finally q.stop()
  }

  test("ready flag appears only after the query is live, stale flags cleared, start failure deletes it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ready = Files.createTempDirectory("rdy").resolve("sub/spark-ready")
    val cpDir = Files.createTempDirectory("rdy_cp").toString

    // stale flag from a "previous run" must not survive into this start
    Files.createDirectories(ready.getParent)
    Files.createFile(ready)

    val input = MemoryStream[SensorReading]
    val shaped = SensorPipeline.documents(
      input.toDS().toDF().selectExpr(
        """to_json(named_struct(
          |'station_name', station_name, 'station_id', station_id,
          |'sensor_id', sensor_id, 'timestamp', timestamp, 'value', value)) AS value""".stripMargin),
      watermarkDelay = "5 seconds", windowDuration = "10 seconds")
    val q = SensorPipeline.start(shaped, cpDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      readyFile = Some(ready)) { (_, _) => () }
    try {
      // flag present exactly once the query object is live
      assert(Files.exists(ready) && q.isActive)
    } finally q.stop()

    // a failed start (batch frame has no writeStream) removes the flag;
    // the flag still exists from the successful run above — the exact
    // stale-green state a crashed redeploy would see
    assert(Files.exists(ready))
    intercept[Throwable] {
      SensorPipeline.start(
        Seq(1).toDF("x"), cpDir, readyFile = Some(ready)) { (_, _) => () }
    }
    assert(!Files.exists(ready),
      "ready flag must not survive a failed start")
  }
}
