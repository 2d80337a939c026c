package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Sketch entries are rows-only in the oracle gate (engine-specific
  * internals); their VALUES are anchored here against the exact forms. */
class SketchAccuracySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("percentile_approx tracks exact quantiles within sketch bounds") {
    val exact = AnalyticsQueries.quantityQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = AnalyticsQueries.quantityQuantilesApprox(spark, dir).collect()
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
  }

  test("approx_count_distinct tracks the exact cardinalities within 2%") {
    val exact = AnalyticsQueries.distinctUsersExact(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AnalyticsQueries.distinctUsersApprox(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx)
      assert(math.abs(a - exact(k)).toDouble / exact(k) <= 0.02, s"$k: $a vs ${exact(k)}")
  }
}
