package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.SensorOps

/** The generator must reproduce the reference producer's payload contract
  * (producer.py:67-85): wire schema, ~5% malformation, non-negative
  * 3-decimal readings. Driven in batch via range (identical expressions
  * to the rate-source stream). */
class SensorGeneratorSpec extends AnyFunSuite with SparkSpec {

  test("payload distribution matches the reference producer contract") {
    val n = 20000L
    val base = spark.range(n).select(
      col("id").as("value"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"))
    val out = SensorGenerator.withPayload(base,
      Map("perugia" -> 15, "terni" -> 10, "assisi" -> 8), malformedPct = 0.05)

    assert(out.columns.toSeq ===
      Seq("station_name", "station_id", "sensor_id", "timestamp", "value"))

    val validated = SensorOps.validate(out, "value").cache()
    val malformed = validated.filter(!col("is_valid")).count()
    val frac = malformed.toDouble / n
    assert(frac > 0.03 && frac < 0.07, s"malformed fraction $frac out of band")

    // valid readings: non-negative, 3-decimal, plausible gaussian range
    val stats = validated.filter(col("is_valid"))
      .agg(min("value_numeric"), max("value_numeric"), avg("value_numeric")).head()
    assert(stats.getDouble(0) >= 0.0)
    assert(stats.getDouble(2) > 30.0 && stats.getDouble(2) < 150.0)

    // station fan-out proportional to sensor counts (15/10/8 of 33)
    val byStation = validated.groupBy("station_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStation("perugia").toDouble / n - 15.0 / 33) < 0.02)
    assert(math.abs(byStation("assisi").toDouble / n - 8.0 / 33) < 0.02)

    // 33 distinct sensors, each pinned to exactly one station
    val sensorStations = validated.select("sensor_id", "station_id").distinct().count()
    assert(sensorStations === 33)
  }
}
