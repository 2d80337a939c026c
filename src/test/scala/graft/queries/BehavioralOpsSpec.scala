package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Semantic checks for batch-3 round-3 operators: SCD2 timeline
  * integrity, RFM tiling, sketch estimator quality, rolling z-score
  * recount, Q3 shape. */
class BehavioralOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("customer_priority_scd2 periods tile each customer's timeline exactly") {
    val rows = RelationalQueries.customerPriorityScd2(spark, dir).collect()
    val orders = Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === orders,
      "every order must land in exactly one validity period")
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, periods) =>
      val ordered = periods.sortBy(_.getAs[Long]("version"))
      // exactly one open period, and it is the last
      assert(ordered.count(_.getAs[Boolean]("is_current")) === 1)
      assert(ordered.last.getAs[Boolean]("is_current"))
      // each closed period ends where the next begins; starts ascend
      // (orders timestamps surface as TIMESTAMP_NTZ → LocalDateTime)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ===
            b.getAs[java.time.LocalDateTime]("valid_from"))
          assert(!a.getAs[java.time.LocalDateTime]("valid_from")
            .isAfter(b.getAs[java.time.LocalDateTime]("valid_from")))
        case _ => ()
      }
      // consecutive periods must actually change priority (maximal runs)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("priority") !== b.getAs[String]("priority"))
        case _ => ()
      }
    }
  }

  test("customer_rfm tiles are balanced quintiles and segments honor their rules") {
    val rows = AnalyticsQueries.customerRfm(spark, dir).collect()
    val n = rows.length
    Seq("r_tile", "f_tile", "m_tile").foreach { t =>
      val sizes = rows.groupBy(_.getAs[Int](t)).view.mapValues(_.size)
      assert(sizes.keys.toSet === (1 to 5).toSet)
      // ntile balance: sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$t unbalanced: $sizes")
    }
    rows.foreach { r =>
      r.getAs[String]("segment") match {
        case "champion" =>
          assert(r.getAs[Int]("r_tile") <= 2 && r.getAs[Int]("f_tile") <= 2
            && r.getAs[Int]("m_tile") <= 2)
        case "at_risk" =>
          assert(r.getAs[Int]("r_tile") >= 4 && r.getAs[Int]("f_tile") >= 4)
        case "regular" => ()
        case other => fail(s"unknown segment $other")
      }
    }
    assert(n === Tables.orders(spark, dir).select("o_custkey").distinct().count())
  }

  test("minhash_jaccard_est: estimator is unbiased enough to rank candidates") {
    val rows = DedupQueries.minhashJaccardEst(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // exact duplicates must have a perfect signature match
      if (r.getAs[Double]("exact_jaccard") === 1.0)
        assert(est === 1.0, s"identical docs with imperfect signature: $r")
    }
    // the sketch's promise: small mean absolute error over candidates
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.25, s"mean |est-exact| = $meanErr — sketch is broken")
  }

  test("sensor_rolling_zscore matches a per-series brute-force recount") {
    val got = StatQueries.sensorRollingZscore(spark, dir).collect()
      .map(r => (r.getAs[String]("station_id"), r.getAs[String]("sensor_id"),
        r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("n_prior"), Option(r.getAs[java.lang.Double]("zscore"))))
      .toMap
    val series = ParityQueries.sensorShaped(spark, dir)
      .selectExpr("station_id", "sensor_id", "event_id", "ts",
        "try_cast(value_str AS double) AS v")
      .where("try_cast(value_str AS double) IS NOT NULL")
      .collect()
      .map(r => (r.getAs[String]("station_id"), r.getAs[String]("sensor_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id"), r.getAs[Double]("v")))
    var checked = 0
    series.groupBy(t => (t._1, t._2)).foreach { case (_, rows2) =>
      val ordered = rows2.sortBy(t => (t._3.getTime, t._4))
      ordered.zipWithIndex.foreach { case ((st, se, _, id, v), i) =>
        val frame = ordered.slice(math.max(0, i - 10), i).map(_._5)
        val (nPrior, z) = got((st, se, id))
        assert(nPrior === frame.length)
        if (frame.length >= 4) {
          val s1 = frame.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
          val s2 = frame.map(x => BigDecimal(x * x).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
          val n = frame.length
          val std = BigDecimal(math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (std > 0) {
            val expected = BigDecimal((v - s1 / n) / std)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            assert(math.abs(z.get - expected) < 2e-6, s"z mismatch for $id")
            checked += 1
          }
        } else assert(z.isEmpty)
      }
    }
    assert(checked > 100, "recount must exercise real scored rows")
  }

  test("q3_shipping_priority returns the top-10 open orders by revenue") {
    val rows = RelationalQueries.q3ShippingPriority(spark, dir).collect()
    assert(rows.length === 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("revenue") >= b.getAs[Double]("revenue"))
      case _ => ()
    }
    val cutoff = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    rows.foreach(r =>
      assert(r.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cutoff)))
  }
}
