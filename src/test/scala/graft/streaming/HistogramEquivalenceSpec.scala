package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the histogram quantile sketch: the same
  * sf0.001 event values played through `HistogramTracker` across two
  * scrambled micro-batches, with the tracker's bounds pinned to the
  * data's [min, max] (what the batch query derives in its first scan),
  * must land on the DuckDB-oracled batch estimates bit-for-bit — the
  * mergeability claim of the sketch made executable. */
class HistogramEquivalenceSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("HistogramTracker reproduces value_hist_quantiles' sketch estimates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val vs = graft.sources.Tables.events(spark, dir)
      .where("value IS NOT NULL")
      .selectExpr("CAST(floor(value * 1e6) AS BIGINT) AS v")
      .as[Long].collect()
    val (vmin, vmax) = (vs.min, vs.max)

    val expected = graft.queries.AnalyticsQueries
      .valueHistQuantiles(spark, dir).collect()
      .map(r => r.getAs[Long]("q_pct") ->
        (r.getAs[Long]("n"), r.getAs[Long]("est_micro"))).toMap

    val rnd = new scala.util.Random(11)
    val (b1, b2) = rnd.shuffle(vs.toSeq).splitAt(vs.length / 2)
    val input = MemoryStream[(String, Long)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new HistogramTracker(vmin, vmax, 256),
        TimeMode.None(), OutputMode.Append())
      .toDF("k", "n", "q_pct", "est_micro")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("histstream").start()
    try {
      input.addData(b1.map(("all", _)))
      q.processAllAvailable()
      input.addData(b2.map(("all", _)))
      q.processAllAvailable()

      // the final batch's emission carries the full count — those five
      // rows must equal the batch query's estimates exactly
      val finals = spark.table("histstream").collect()
        .filter(_.getAs[Long]("n") == vs.length.toLong)
        .map(r => r.getAs[Long]("q_pct") -> r.getAs[Long]("est_micro"))
        .toMap
      assert(finals.keySet === Set(25L, 50L, 75L, 90L, 99L))
      expected.foreach { case (qp, (n, est)) =>
        assert(n === vs.length.toLong)
        assert(finals(qp) === est, s"estimate mismatch at p$qp")
      }
      // mid-stream emissions exist too: the sketch answers at any point,
      // not only at end-of-stream
      assert(spark.table("histstream").count() === 10L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("an oversized [vmin, vmax] deployment range fails fast at construction") {
    // (clamped − vmin) · bins wraps Long past span ≈ 2^55 — the guard
    // must reject it instead of silently corrupting bins
    intercept[IllegalArgumentException](
      new HistogramTracker(Long.MinValue / 2, Long.MaxValue / 2, 256))
    intercept[IllegalArgumentException](new HistogramTracker(10L, 5L))
    intercept[IllegalArgumentException](new HistogramTracker(0L, 100L, 0))
    // the largest legal span still constructs
    new HistogramTracker(0L, Long.MaxValue / 256 - 1, 256)
  }
}
