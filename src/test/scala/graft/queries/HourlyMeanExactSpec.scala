package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Boundary audit for the shared hourly-mean frame's exactness contract
  * (TimeSeriesQueries.hourlyMeans): the mean is ONE truncating integral
  * division of the exact decimal micro-unit sum — never round(double/n,6).
  * The fixture drives the division onto an exact .xxxxxx5 half, the input
  * a HALF_UP-vs-HALF_EVEN engine disagreement would corrupt: truncation
  * has no tie to break, so the result is forced bit-for-bit. */
class HourlyMeanExactSpec extends AnyFunSuite with SparkSpec {

  test("hourly mean truncates an exact .xxxxxx5 half (no rounding coin-flip)") {
    val dir = Files.createTempDirectory("hourly_exact").toString
    val h0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def at(sec: Int) = Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d")
    import spark.implicits._
    val rows = Seq(
      // sum = 2.000003 → mean 1.0000015 exactly: the half-case.
      // round(double/n, 6) HALF_UP gives 1.000002; banker's rounding
      // gives 1.000002 too here but differs elsewhere — the contract is
      // TRUNCATION: x_micro = 2000003 div 2 = 1000001, both engines.
      (1L, at(0), 7L, "s_half", Some(1.000001), "{}"),
      (2L, at(1), 7L, "s_half", Some(1.000002), "{}"),
      // an exactly divisible sum must come through untouched
      (3L, at(2), 7L, "s_even", Some(2.5), "{}"),
      (4L, at(3), 7L, "s_even", Some(3.5), "{}"),
      // malformed rows are dropped BEFORE the mean, not averaged as zero
      (5L, at(4), 7L, "error", Some(99.0), "{}"),
      (6L, at(5), 7L, "s_even", None, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = TimeSeriesQueries.hourlyMeans(spark, dir)
      .select("sensor_id", "h", "x_micro").collect()
      .map(r => (r.getAs[String]("sensor_id"), r.getAs[Timestamp]("h"),
        r.getAs[Long]("x_micro"))).toSet
    assert(got === Set(
      ("s_half", h0, 1000001L), // truncated, NOT 1000002
      ("s_even", h0, 3000000L)))
  }

  test("per-reading quantization is the DECIMAL(18,6) HALF_UP cast, then exact") {
    // the only rounding in the pipeline is the per-reading double→decimal
    // quantization (a fixed, single-value cast — no accumulation order to
    // disagree on); after it, everything is integer. 0.0000015 quantizes
    // to 0.000002 per the cast contract, so three readings sum to
    // 6 micro → mean 2 micro exactly.
    val dir = Files.createTempDirectory("hourly_quant").toString
    def at(sec: Int) = Timestamp.valueOf(f"2024-03-01 11:00:$sec%02d")
    import spark.implicits._
    Seq((1L, at(0), 1L, "q", Some(0.0000015), "{}"),
      (2L, at(1), 1L, "q", Some(0.0000015), "{}"),
      (3L, at(2), 1L, "q", Some(0.0000015), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeriesQueries.hourlyMeans(spark, dir).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("x_micro") === 2L)
  }
}
