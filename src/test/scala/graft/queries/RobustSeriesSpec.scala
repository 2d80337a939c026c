package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-7 robust-series tier:
  * Mann–Kendall trend test, Hampel filter, peak detection. Each recount
  * re-derives the expected output from the raw events table with
  * independent Scala code (no shared query plumbing) at sf0.001, where
  * exhaustive pair scans are cheap. */
class RobustSeriesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Per-sensor chronological micro-unit hourly means, recounted with
    * independent BigDecimal arithmetic (the hourlyMeans contract:
    * HALF_UP 6-dp quantization, exact sum, one truncating division). */
  private def hourlySeries(): Map[String, Vector[Long]] = {
    val rows = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error" && col("value").isNotNull)
      .select(col("event_type").as("sensor_id"),
        date_trunc("hour", col("ts")).as("h"), col("value"))
      .collect()
    rows.groupBy(r =>
      (r.getAs[String]("sensor_id"), r.getAs[java.sql.Timestamp]("h")))
      .map { case ((s, h), rs) =>
        val sumMicro = rs.map(r => BigDecimal(r.getAs[Double]("value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact).sum
        (s, h, sumMicro / rs.length)
      }
      .groupBy(_._1)
      .map { case (s, cells) =>
        s -> cells.toVector.sortBy(_._2.getTime).map(_._3)
      }
  }

  test("sensor_mann_kendall: S, tie-corrected variance, and z match a brute-force pair scan") {
    val series = hourlySeries()
    val rows = TimeSeriesQueries.sensorMannKendall(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("sensor_id")
      val x = series(s)
      val n = x.length.toLong
      val sStat = (for {
        i <- x.indices; j <- (i + 1) until x.length
      } yield java.lang.Long.signum(x(j) - x(i)).toLong).sum
      val tieTerm = x.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val v18 = n * (n - 1) * (2 * n + 5) - tieTerm
      assert(r.getAs[Long]("n_hours") === n)
      assert(r.getAs[Long]("s_stat") === sStat, s"S mismatch for $s")
      assert(r.getAs[Long]("var_s_x18") === v18, s"variance mismatch for $s")
      val z = if (v18 <= 0) 0.0
      else math.floor((sStat - java.lang.Long.signum(sStat)).toDouble /
        math.sqrt(v18.toDouble / 18.0) * 1e6) / 1e6
      assert(r.getAs[Double]("z_stat") === z, s"z mismatch for $s")
    }
  }

  test("sensor_hampel: medians, MADs, and outlier flags match brute-force neighborhoods") {
    val series = hourlySeries()
    val rows = TimeSeriesQueries.sensorHampel(spark, dir).collect()
    assert(rows.nonEmpty)
    // group result rows per sensor in chronological (h) order — the
    // query's own ordering — and walk them against the recounted series
    rows.groupBy(_.getAs[String]("sensor_id")).foreach { case (s, rs) =>
      val x = series(s)
      assert(rs.length === x.length, s"row count mismatch for $s")
      def lowerMedian(v: Seq[Long]): Long = v.sorted.apply((v.length - 1) / 2)
      rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
        .zipWithIndex.foreach { case (r, i) =>
          val nbrs = (math.max(0, i - 3) to math.min(x.length - 1, i + 3)).map(x)
          val med = lowerMedian(nbrs)
          val mad = lowerMedian(nbrs.map(v => math.abs(v - med)))
          val out = math.abs(x(i) - med) * 10000 > mad * 44478
          assert(r.getAs[Long]("x_micro") === x(i))
          assert(r.getAs[Long]("med_micro") === med, s"median mismatch $s@$i")
          assert(r.getAs[Long]("mad_micro") === mad, s"MAD mismatch $s@$i")
          assert(r.getAs[Boolean]("is_outlier") === out, s"flag mismatch $s@$i")
          assert(r.getAs[Long]("repaired_micro") === (if (out) med else x(i)))
        }
    }
  }

  test("sensor_peaks: exactly the strict 2-sided local maxima, with exact margins") {
    val series = hourlySeries()
    val rows = TimeSeriesQueries.sensorPeaks(spark, dir).collect()
    assert(rows.nonEmpty)
    val bySensor = rows.groupBy(_.getAs[String]("sensor_id"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)).toMap
    series.foreach { case (s, x) =>
      val expected = (2 until x.length - 2).collect {
        case i if x(i) > x(i - 1) && x(i) > x(i - 2)
          && x(i) > x(i + 1) && x(i) > x(i + 2) =>
          (x(i), x(i) - Seq(x(i - 1), x(i - 2), x(i + 1), x(i + 2)).max)
      }
      val got = bySensor.getOrElse(s, Array.empty).toSeq
        .map(r => (r.getAs[Long]("x_micro"), r.getAs[Long]("prominence_micro")))
      assert(got === expected, s"peak set mismatch for $s")
    }
  }
}
