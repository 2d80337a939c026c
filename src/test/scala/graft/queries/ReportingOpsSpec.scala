package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Cross-checks for the reporting/statistics batch: heap top-k vs window
  * top-k, growth ratios, Welch t recount. */
class ReportingOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rank_parts_heap produces the window ranking's exact (brand, rk, part) set") {
    val heap = RelationalQueries.rankPartsHeap(spark, dir).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("rk"), r.getAs[Long]("p_partkey")))
      .toSet
    val window = RelationalQueries.rankPartsPerBrand(spark, dir).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("rk"), r.getAs[Long]("p_partkey")))
      .toSet
    assert(heap === window)
    assert(heap.nonEmpty)
  }

  test("orders_mom_growth ratios recompute from adjacent revenue rows") {
    val rows = RelationalQueries.ordersMomGrowth(spark, dir).collect()
      .sortBy(_.getAs[java.sql.Timestamp]("month").getTime)
    assert(rows.head.getAs[java.lang.Double]("mom_pct") === null,
      "the first month has no prior to grow from")
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        val expected = math.floor(
          (cur.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) * 1e4 /
            prev.getAs[Double]("revenue")) / 1e4
        assert(cur.getAs[Double]("mom_pct") === expected)
      case _ => ()
    }
  }

  test("region_acctbal_ttest matches a direct per-pair recount") {
    val rows = AnalyticsQueries.regionAcctbalTtest(spark, dir).collect()
    assert(rows.length === 10, "5 regions pair into C(5,2) = 10 rows")
    // independent recount of one pair from raw balances
    val r = rows.head
    val (ra, rb) = (r.getAs[String]("region_a"), r.getAs[String]("region_b"))
    def stats(region: String): (Long, Double, Double) = {
      val xs = Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir),
          org.apache.spark.sql.functions.col("c_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
        .join(Tables.region(spark, dir),
          org.apache.spark.sql.functions.col("n_regionkey") ===
            org.apache.spark.sql.functions.col("r_regionkey"))
        .where(org.apache.spark.sql.functions.col("r_name") === region)
        .select("c_acctbal").collect().map(_.getDouble(0))
      val n = xs.length.toLong
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      (n, mean, variance)
    }
    val (na, ma, va) = stats(ra)
    val (nb, mb, vb) = stats(rb)
    assert(r.getAs[Long]("n_a") === na)
    assert(r.getAs[Long]("n_b") === nb)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    // the query's decimal-moment path differs from this naive fold only at ulps
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3)
  }
}
