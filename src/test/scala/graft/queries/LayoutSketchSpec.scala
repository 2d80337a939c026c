package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-7 KMV sketch and the
  * range-partition planner, re-derived from the raw tables at sf0.001. */
class LayoutSketchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("user_kmv_distinct: k-th hash estimate matches an independent replay") {
    val byType = Tables.events(spark, dir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      .distinct.groupBy(_._1)
      .view.mapValues(_.map(p => md5h60(p._2.toString)).distinct.sorted).toMap
    val rows = AnalyticsQueries.userKmvDistinct(spark, dir).collect()
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hs = byType(t)
      assert(r.getAs[Long]("distinct_hashes") === hs.size.toLong)
      val est =
        if (hs.size < 128) hs.size.toLong
        else (BigInt(127) * BigInt(2).pow(60) / hs(127)).toLong
      assert(r.getAs[Long]("kmv_est") === est, s"estimate mismatch for $t")
      // k=128 gives ~1/sqrt(128) ≈ 8.8% relative error; 35% is a loose
      // 4-sigma envelope that still catches a broken estimator
      if (hs.size >= 128)
        assert(r.getAs[Long]("abs_err_ppm") < 350000L, s"error too large for $t")
    }
  }

  test("orders_range_partition_plan: buckets match the SQL ntile rule replay") {
    val cents = Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getAs[Long]("o_orderkey"),
        (BigDecimal(r.getAs[Double]("o_totalprice"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
      .sortBy { case (k, c) => (c, k) }
    val n = cents.length
    val big = n % 32
    val szSmall = (n - big) / 32
    val buckets = cents.zipWithIndex.map { case ((_, c), i) =>
      val b = if (i < big * (szSmall + 1)) i / (szSmall + 1)
      else big + (i - big * (szSmall + 1)) / szSmall
      (b + 1, c)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = AnalyticsQueries.ordersRangePartitionPlan(spark, dir).collect()
    assert(rows.length === 32)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      val cs = buckets(b)
      assert(r.getAs[Long]("n_rows") === cs.length.toLong, s"count b$b")
      assert(r.getAs[Long]("lo_cents") === cs.min, s"lo b$b")
      assert(r.getAs[Long]("hi_cents") === cs.max, s"hi b$b")
      assert(r.getAs[Long]("width_cents") === cs.max - cs.min)
    }
    // equi-depth: bucket sizes differ by at most one row
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
  }
}
