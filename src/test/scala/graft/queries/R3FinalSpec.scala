package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Independent re-derivations for the round-3 closing operators — the
  * checks a value-hash oracle can't express. */
class R3FinalSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("orders_skyline matches a brute-force O(N²) dominance recount") {
    val got = AnalyticsQueries.ordersSkyline(spark, dir).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val all = graft.sources.Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS d",
        "round(o_totalprice, 2) AS p")
      .collect()
      .map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Double]("p")))
    // strict dominance: earlier-or-equal date AND higher-or-equal price,
    // strict in at least one
    val expected = all.filter { case (_, d1, p1) =>
      !all.exists { case (_, d2, p2) =>
        !d2.isAfter(d1) && p2 >= p1 && (d2.isBefore(d1) || p2 > p1)
      }
    }.map(_._1).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("corpus_yield_report: stage counts are monotone non-increasing") {
    val r = PipelineQueries.corpusYieldReport(spark, dir).collect().head
    val stages = Seq("n_total", "n_nonempty", "n_length_pass",
      "n_quality_pass", "n_dedup_pass", "n_decontaminated")
      .map(r.getAs[Long])
    stages.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"funnel must shrink: $stages")
    }
    assert(stages.last > 0, "the funnel must not eat the whole corpus")
    assert(r.getAs[Double]("final_yield") <= r.getAs[Double]("quality_yield"))
  }

  test("nation_revenue_share: shares form a (floored) distribution, ranks honest") {
    val rows = RelationalQueries.nationRevenueShare(spark, dir).collect()
    assert(rows.length === 25)
    val shares = rows.map(_.getAs[Double]("share"))
    // floor-quantized shares: sum is <= 1 and within 25 quanta of it
    assert(shares.sum <= 1.0 + 1e-9)
    assert(shares.sum >= 1.0 - 25 * 1e-6)
    // rank 1 is the max revenue; ranks ascend as revenue descends
    val byRank = rows.sortBy(_.getAs[Int]("rk"))
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("revenue") >= b.getAs[Double]("revenue"))
    }
  }
}
