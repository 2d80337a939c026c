package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** K3–K5 fan-out: both the scalable partitionBy writer and the
  * reference-mechanics loop must produce identical per-station contents. */
class FanOutSpec extends AnyFunSuite with SparkSpec {

  private def sampleDf = {
    import spark.implicits._
    Seq(
      ("perugia", "1", 10.0), ("perugia", "2", 20.0),
      ("terni", "1", 30.0), ("assisi", "3", 40.0))
      .toDF("station_id", "sensor_id", "avg_value")
  }

  test("partitionBy writer routes rows to per-station directories") {
    val dir = Files.createTempDirectory("fanout_p").toString
    FanOut.writePartitioned(sampleDf, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4)
    assert(back.where(back("station_id") === "perugia").count() === 2)
    // physical layout: one directory per station (hive-style partition)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("station_id=assisi", "station_id=perugia", "station_id=terni"))
  }

  test("reference-mechanics loop writes station_<id> destinations") {
    val dir = Files.createTempDirectory("fanout_l").toString
    FanOut.writePerStationLoop(sampleDf, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("station_assisi", "station_perugia", "station_terni"))
    val perugia = spark.read.parquet(s"$dir/station_perugia")
    assert(perugia.count() === 2)
    assert(perugia.columns.contains("station_id"))
  }
}
