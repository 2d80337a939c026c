package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 — the reference's synthetic sensor-payload generator
  * (`/root/reference/simulator/producer.py:67-106`) as a Spark streaming
  * source: `rate` source rows mapped to the same payload distribution —
  * per-sensor mean `max(30, gauss(70, 20))`, reading `max(0,
  * round(gauss(mean, mean/10), 3))`, ~5% `"<<bad_data>>"` malformation.
  *
  * Gaussians are produced with Box–Muller over hash-derived uniforms, all
  * as codegen'd column expressions — fully distributed and deterministic
  * per (sensor, sequence) so tests can assert on the stream.
  */
object SensorGenerator {

  private val TwoPi = 2.0 * math.Pi

  /** Uniform(0,1] from a hashed seed expression — xxhash64 bits scaled. */
  private def uniform(seedCol: org.apache.spark.sql.Column) =
    (pmod(xxhash64(seedCol), lit(1000000007L)).cast("double") + 1.0) / 1000000008.0

  /** Box–Muller N(0,1) from two independent uniforms. */
  private def gauss(u1: org.apache.spark.sql.Column, u2: org.apache.spark.sql.Column) =
    sqrt(lit(-2.0) * log(u1)) * cos(lit(TwoPi) * u2)

  /** Streaming frame of SensorReading-shaped rows.
    *
    * @param stations       station_id → sensor count (mirrors config.json)
    * @param rowsPerSecond  aggregate rate across all sensors
    */
  def stream(
      spark: SparkSession,
      stations: Map[String, Int] = Map("perugia" -> 15, "terni" -> 10, "assisi" -> 8),
      rowsPerSecond: Int = 132,
      malformedPct: Double = 0.05): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load() // columns: timestamp, value (monotonic long)
    withPayload(base, stations, malformedPct)
  }

  /** The payload mapping, separated so batch tests can drive it from
    * `spark.range` — identical expressions either way. */
  def withPayload(
      base: DataFrame,
      stations: Map[String, Int],
      malformedPct: Double): DataFrame = {
    val totalSensors = stations.values.sum
    // (station, sensor) assignment by global sensor index
    val bounds = stations.toSeq.sortBy(_._1)
      .scanLeft(("", 0)) { case ((_, acc), (st, n)) => (st, acc + n) }.drop(1)
    val idx = pmod(col("value"), lit(totalSensors.toLong))
    val stationCol = bounds.foldRight(lit(bounds.last._1)) { case ((st, hi), acc) =>
      when(idx < hi, lit(st)).otherwise(acc)
    }
    val u = (tag: String) => uniform(concat(col("value"), lit(tag)))
    val meanU1 = (tag: String) => uniform(concat(idx, lit(tag))) // per-sensor, stable
    val sensorMean = greatest(lit(30.0),
      lit(70.0) + lit(20.0) * gauss(meanU1("m1"), meanU1("m2")))
    val reading = greatest(lit(0.0),
      round(sensorMean + (sensorMean / 10.0) * gauss(u("v1"), u("v2")), 3))
    base.select(
      lit("Station").as("station_name"),
      stationCol.as("station_id"),
      pmod(col("value"), lit(totalSensors.toLong)).cast("string").as("sensor_id"),
      (unix_millis(col("timestamp"))).as("timestamp"),
      when(u("bad") < malformedPct, lit("<<bad_data>>"))
        .otherwise(reading.cast("string")).as("value"))
  }
}
