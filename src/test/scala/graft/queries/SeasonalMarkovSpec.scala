package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles recomputes for sensor_seasonal_residuals (exact
  * integer 3σ inequality re-derived with BigInt — no decimal/double
  * machinery shared with the query) and event_markov_entropy (chain
  * rebuilt in plain Scala, entropies compared within ln-rounding
  * tolerance, shares exactly). */
class SeasonalMarkovSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sensor_seasonal_residuals matches a BigInt recount") {
    val rows = graft.sources.Tables.events(spark, dir)
      .filter("event_type <> 'error' AND value IS NOT NULL")
      .selectExpr("event_type", "cast(hour(ts) as int) as hod",
        "cast(round(value * 100) as long) as xc")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    val cells = rows.groupBy(r => (r._1, r._2)).map { case (k, vs) =>
      val xs = vs.map(_._3)
      (k, (xs.length.toLong, xs.sum, xs.map(x => BigInt(x) * x).sum))
    }
    val expected = rows.groupBy(_._1).map { case (sensor, vs) =>
      var anom = 0L; var unsupported = 0L
      vs.foreach { case (_, hod, xc) =>
        val (n, s1, s2) = cells((sensor, hod))
        if (n >= 2) {
          val lhs = BigInt(n) * xc - s1
          if (lhs * lhs > 9 * (BigInt(n) * s2 - BigInt(s1) * s1)) anom += 1
        } else unsupported += 1
      }
      (sensor, vs.length.toLong, anom, unsupported,
        Math.floorDiv(anom * 1000000L, vs.length))
    }.toSeq.sortBy(_._1)

    val got = TimeSeriesQueries.sensorSeasonalResiduals(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected)
    assert(expected.exists(_._3 > 0), "no anomalies — vacuous fixture")
    assert(expected.forall(e => e._3 < e._2 / 2), "half the data anomalous — broken test")
  }

  test("event_markov_entropy matches a plain-Scala chain recount") {
    val ev = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(_._2).map(_._3)
      seq.zip(seq.tail)
    }
    val bySrc = trans.groupBy(_._1)
    val total = trans.length.toLong
    val expected = bySrc.map { case (src, ts) =>
      val n = ts.length.toLong
      val counts = ts.groupBy(_._2).map(_._2.length.toLong)
      val h = math.log(n.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / n
      (src, n, counts.size.toLong, h, Math.floorDiv(n * 1000000L, total))
    }.toSeq.sortBy(_._1)

    val got = AnalyticsQueries.eventMarkovEntropy(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._5)).toSeq ===
      expected.map(e => (e._1, e._2, e._3, e._5)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-4, s"entropy diverged for ${g._1}")
      assert(g._4 >= 0 && g._4 <= math.log(g._3.toDouble) + 1e-6,
        s"entropy outside [0, ln(out_degree)] for ${g._1}")
    }
    // shares partition the transition mass
    assert(math.abs(got.map(_._5).sum - 1000000L) <= got.length)
  }
}
