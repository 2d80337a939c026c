package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** GlobalWindow must be BYTE-IDENTICAL to the single-partition global
  * window it replaces, for every supported shape — that equivalence is
  * what lets the registry queries swap implementations without their
  * oracle hashes moving. The fixture key is deliberately hostile: heavy
  * ties on the primary sort column (tiebreak does the total-ordering
  * work), a skewed value distribution, and more range partitions than
  * distinct keys (empty partitions). */
class GlobalWindowSpec extends AnyFunSuite with SparkSpec {

  /** 1000 rows, key = hash-scrambled with ~100 distinct primaries. */
  private def fixture: DataFrame =
    spark.range(1000).select(
      (pmod(hash(col("id")), lit(100))).as("k"),
      col("id"),
      (pmod(hash(col("id") + 7), lit(1000)) + 1).cast("long").as("v"))

  test("rowNumber matches the global window for any partition count") {
    val df = fixture
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    for (parts <- Seq(1, 3, 32, 2048)) { // 2048 > distinct keys: empty partitions
      val got = GlobalWindow.rowNumber(df, "rn", parts)(col("k"), col("id"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"rowNumber diverged at numParts=$parts")
    }
  }

  test("rowNumber matches the global window under DESCENDING order") {
    // the map-side local numbering reads positions off the in-partition
    // sort — a descending order must range-partition AND sort descending
    val df = fixture
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
    for (parts <- Seq(3, 32)) {
      val got = GlobalWindow.rowNumber(df, "rn", parts)(col("k").desc, col("id"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"descending rowNumber diverged at numParts=$parts")
    }
  }

  test("rowNumberWithCount carries the exact total") {
    val df = fixture
    val got = GlobalWindow.rowNumberWithCount(df, "rn", "cnt", 8)(
      col("k"), col("id"))
    assert(got.filter(col("cnt") =!= 1000L).count() === 0)
    assert(got.agg(max(col("rn"))).head().getLong(0) === 1000L)
  }

  test("ntile matches windowed ntile including non-dividing bucket counts") {
    val df = fixture
    for (n <- Seq(2, 5, 7, 10, 32, 999, 1000, 1500)) { // 1500 > rows: degenerate
      val expected = df.withColumn("t",
        ntile(n).over(Window.orderBy(col("k"), col("id"))))
      val got = GlobalWindow.ntile(df, n, "t", 16)(col("k"), col("id"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"ntile($n) diverged")
    }
  }

  test("runningSum matches the inclusive-frame global running sum") {
    val df = fixture
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
    val got = GlobalWindow.runningSum(df, col("v"), "cum", 16)(
      col("k"), col("id"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("rowNumberAndRunningSum agrees with both windows at once") {
    val df = fixture
    val ord = Window.orderBy(col("k"), col("id"))
    val expected = df
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = GlobalWindow.rowNumberAndRunningSum(
      df, col("v"), "rn", "cum", 8)(col("k"), col("id"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("two-phase plan contains no unpartitioned window sort") {
    sys.props("graft.materialize") = "off"
    try {
      val plan = GlobalWindow.rowNumber(fixture, "rn", 8)(col("k"), col("id"))
        .queryExecution.optimizedPlan
      val global = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty => w
      }
      assert(global.isEmpty, s"unpartitioned window sort in:\n$plan")
    } finally sys.props.remove("graft.materialize")
  }
}
