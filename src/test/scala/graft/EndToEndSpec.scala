package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorReading
import graft.ops.FanOut
import graft.streaming.SensorPipeline

/** The full reference scenario in one run (the "switch from MASD" demo):
  * generator-shaped payloads → JSON wire → parse/validate → watermarked
  * windowed metrics → nested documents → foreachBatch → per-station
  * append-only destinations. Asserts the golden output contract
  * (docs/usage.md:119-142) at the final resting place of the data.
  */
class EndToEndSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("sensor stream lands as per-station nested documents") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val outDir = Files.createTempDirectory("e2e_out").toString
    val cpDir = Files.createTempDirectory("e2e_cp").toString

    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val shaped = SensorPipeline.documents(raw,
      watermarkDelay = "5 seconds", windowDuration = "10 seconds")
    val q = SensorPipeline.start(shaped, cpDir, Trigger.ProcessingTime("1 second")) {
      (batch, _) =>
        FanOut.writePartitionedSized(
          batch.select(
            col("station.id").as("station_id"),
            col("sensor.id").as("sensor_id"),
            col("window.start").as("window_start"),
            col("metrics.min_value"), col("metrics.max_value"),
            col("metrics.avg_value"),
            col("metrics.count.total"), col("metrics.count.malformed")),
          outDir)
    }
    try {
      input.addData(
        SensorReading("Perugia", "perugia", "1", t0 + 1000, "40.1"),
        SensorReading("Perugia", "perugia", "1", t0 + 2000, "45.2"),
        SensorReading("Perugia", "perugia", "1", t0 + 3000, "<<bad_data>>"),
        SensorReading("Terni", "terni", "2", t0 + 4000, "12.0"))
      input.addData(SensorReading("Terni", "terni", "2", t0 + 30000, "13.0"))
      q.processAllAvailable()
    } finally q.stop()

    // per-station destinations exist (hive partition per station)
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("station_id=perugia", "station_id=terni"))

    // golden document values for perugia/sensor 1, window [t0, t0+10s)
    val p = spark.read.parquet(outDir)
      .filter(col("station_id") === "perugia" && col("sensor_id") === "1")
      .head()
    assert(p.getAs[Double]("min_value") === 40.1)
    assert(p.getAs[Double]("max_value") === 45.2)
    assert(math.abs(p.getAs[Double]("avg_value") - 42.65) < 1e-9)
    assert(p.getAs[Long]("total") === 3L)
    assert(p.getAs[Long]("malformed") === 1L)

    // sized write: exactly one file per station per batch
    val perugiaFiles = new java.io.File(s"$outDir/station_id=perugia")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(perugiaFiles.length === 1, s"expected 1 file, got ${perugiaFiles.length}")
  }

  test("sized fan-out bounds files per station under a skewed distribution") {
    // the 100 TB operational incident the sized writer exists for: T
    // upstream tasks × S stations = T·S tiny files from the plain
    // writer, S files from the sized one — regardless of skew. One hot
    // station carries 200× the cold ones across 8 upstream partitions.
    val outSized = Files.createTempDirectory("fanout_sized").toString
    val outPlain = Files.createTempDirectory("fanout_plain").toString
    val hot = spark.range(10000)
      .select(lit("hot").as("station_id"), col("id").as("v"))
    val cold = spark.range(50)
      .select(concat(lit("cold"), pmod(col("id"), lit(5))).as("station_id"),
        col("id").as("v"))
    val skewed = hot.unionAll(cold).repartition(8) // many upstream tasks
    FanOut.writePartitioned(skewed, outPlain)
    FanOut.writePartitionedSized(skewed, outSized)

    def files(dir: String, s: String): Int = {
      val d = new java.io.File(s"$dir/station_id=$s")
      if (!d.isDirectory) 0
      else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val stations = "hot" +: (0 until 5).map(i => s"cold$i")
    stations.foreach { s =>
      assert(files(outSized, s) === 1,
        s"sized writer must emit exactly 1 file for $s, got ${files(outSized, s)}")
    }
    // the fixture genuinely exhibits the pathology the sized writer fixes
    assert(files(outPlain, "hot") > 1,
      "plain writer produced 1 file for the hot station — skew fixture too weak")
    // same data lands either way
    assert(spark.read.parquet(outSized).count() === 10050L)
    assert(spark.read.parquet(outPlain).count() === 10050L)
  }
}
