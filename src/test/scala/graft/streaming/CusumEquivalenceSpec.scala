package graft.streaming

import scala.math.BigDecimal.RoundingMode.HALF_UP

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for CUSUM: the batch query's hourly series
  * played through `CusumTracker` across two micro-batches (scrambled
  * WITHIN each batch — the tracker must re-sort by event time) must
  * reproduce the DuckDB-oracled batch closed form bit-for-bit. The
  * tracker's Phase-II baseline (μ, σ) is re-derived here with the exact
  * decimal-moment discipline the batch query uses, proving the Phase I /
  * Phase II split loses nothing. */
class CusumEquivalenceSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CusumTracker reproduces sensor_cusum exactly across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val batch = graft.queries.TimeSeriesQueries.sensorCusum(spark, dir)
    val rows = batch
      .selectExpr("sensor_id", "unix_micros(h) AS h_us", "x",
        "cusum_pos", "cusum_neg", "is_shift")
      .as[(String, Long, Double, Double, Double, Boolean)]
      .collect()
      .sortBy(r => (r._2, r._1))

    // Phase-I baseline per sensor, replicating the batch query's exact
    // arithmetic: DECIMAL(·,6) sums, double division, IEEE sqrt
    val params = rows.groupBy(_._1).map { case (k, rs) =>
      val xs = rs.map(_._3)
      val n = xs.length
      val s1 = xs.map(x => BigDecimal(x).setScale(6, HALF_UP)).sum
      val s2 = xs.map { x =>
        val xd = BigDecimal(x).setScale(6, HALF_UP); xd * xd
      }.sum
      val mu = s1.toDouble / n
      val sigma = math.sqrt(
        (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1))
      k -> (mu, sigma)
    }

    val (b1, b2) = rows.splitAt(rows.length / 2)
    val rnd = new scala.util.Random(11)
    val input = MemoryStream[(String, Long, Double)]
    val scored = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new CusumTracker(params), TimeMode.None(), OutputMode.Append())
      .toDF("k", "h_us", "x", "cusum_pos", "cusum_neg", "is_shift")
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("cusumstream").start()
    try {
      input.addData(rnd.shuffle(b1.map(r => (r._1, r._2, r._3)).toSeq))
      q.processAllAvailable()
      input.addData(rnd.shuffle(b2.map(r => (r._1, r._2, r._3)).toSeq))
      q.processAllAvailable()

      val got = spark.table("cusumstream").collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Long]("h_us")) ->
          (r.getAs[Double]("cusum_pos"), r.getAs[Double]("cusum_neg"),
            r.getAs[Boolean]("is_shift")))
        .toMap
      assert(got.size === rows.length)
      rows.foreach { case (k, hUs, _, sp, sn, shift) =>
        val (gotSp, gotSn, gotShift) = got((k, hUs))
        assert(gotSp === sp, s"cusum_pos mismatch at ($k, $hUs)")
        assert(gotSn === sn, s"cusum_neg mismatch at ($k, $hUs)")
        assert(gotShift === shift, s"is_shift mismatch at ($k, $hUs)")
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
