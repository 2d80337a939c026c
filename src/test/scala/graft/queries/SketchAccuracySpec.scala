package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Sketch entries are oracled BY BOUND (the registered query emits the
  * exact value plus an in-query envelope check the oracle asserts TRUE).
  * This spec anchors the RAW sketch values against the exact forms — the
  * numbers the in-query booleans summarize — so a sketch regression is
  * diagnosable, not just detected. */
class SketchAccuracySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("percentile_approx tracks exact quantiles within sketch bounds") {
    val exact = AnalyticsQueries.quantityQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("q"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).cast("double").as("q25"),
        element_at(col("q"), 2).cast("double").as("median"),
        element_at(col("q"), 3).cast("double").as("q75"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, (a25, a50, a75)) <- approx) {
      val (e25, e50, e75) = exact(flag)
      // l_quantity is integral; GK at accuracy 10000 lands within one
      // neighboring value of the interpolated exact quantile
      assert(math.abs(a25 - e25) <= 1.0, s"$flag q25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= 1.0, s"$flag median: $a50 vs $e50")
      assert(math.abs(a75 - e75) <= 1.0, s"$flag q75: $a75 vs $e75")
    }
    // and the registered query's in-query envelope check agrees
    val flags = AnalyticsQueries.quantityQuantilesApprox(spark, dir).collect()
    assert(flags.forall(_.getAs[Boolean]("gk_within_bound")))
  }

  test("approx_count_distinct tracks the exact cardinalities within 2%") {
    val exact = AnalyticsQueries.distinctUsersExact(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_approx"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx)
      assert(math.abs(a - exact(k)).toDouble / exact(k) <= 0.02, s"$k: $a vs ${exact(k)}")
    val flags = AnalyticsQueries.distinctUsersApprox(spark, dir).collect()
    assert(flags.forall(_.getAs[Boolean]("sketch_within_3rsd")))
  }

  test("count_min_sketch point estimates honor the one-sided eps envelope") {
    import graft.functions.TextFunctions
    val toks = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val row = toks.agg(
      expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("n_total")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
    val slack = math.ceil(row.getAs[Long]("n_total") * 0.001).toLong
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("tf")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    // EVERY token (not just the 20 registry anchors): never under, over
    // by at most eps x stream length
    for ((t, tf) <- exact) {
      val e = cms.estimateCount(t)
      assert(e >= tf, s"$t: CMS under-counted ($e < $tf)")
      assert(e <= tf + slack, s"$t: CMS past envelope ($e > $tf + $slack)")
    }
    val flags = PipelineQueries.tokenHeavyHittersCms(spark, dir).collect()
    assert(flags.length === 20)
    assert(flags.forall(_.getAs[Boolean]("cms_within_eps")))
  }
}
