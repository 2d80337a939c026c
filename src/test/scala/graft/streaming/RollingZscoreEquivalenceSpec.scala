package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the rolling z-score: the same sf0.001
  * sensor readings played through `RollingZscoreTracker` across two
  * micro-batches (scrambled WITHIN each batch — the tracker must re-sort
  * by event time) must reproduce the DuckDB-oracled batch query
  * bit-for-bit, unscored rows included. */
class RollingZscoreEquivalenceSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("RollingZscoreTracker reproduces sensor_rolling_zscore exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // (key, tsUs, eventId, value) in global (ts, eventId) order
    val rows = graft.queries.ParityQueries.sensorShaped(spark, dir)
      .selectExpr("concat(station_id, '|', sensor_id) AS k",
        "unix_micros(ts) AS ts_us", "event_id",
        "try_cast(value_str AS double) AS v")
      .where("try_cast(value_str AS double) IS NOT NULL")
      .as[(String, Long, Long, Double)]
      .collect()
      .sortBy(r => (r._2, r._3))

    // split at the global midpoint: per-key prefix order is preserved
    // across batches; shuffle INSIDE each batch to prove the tracker's
    // event-time fold does the ordering work
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val rnd = new scala.util.Random(7)
    val input = MemoryStream[(String, Long, Long, Double)]
    val scored = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new RollingZscoreTracker(10, 4), TimeMode.None(), OutputMode.Append())
      .toDF("k", "event_id", "v", "n_prior", "z")
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("zstream").start()
    try {
      input.addData(rnd.shuffle(b1.toSeq))
      q.processAllAvailable()
      input.addData(rnd.shuffle(b2.toSeq))
      q.processAllAvailable()

      val got = spark.table("zstream").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Long]("n_prior"), r.getAs[Double]("z")))
        .toMap
      val expected = graft.queries.StatQueries.sensorRollingZscore(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Long]("n_prior"),
            Option(r.getAs[java.lang.Double]("zscore")).map(_.doubleValue)))
        .toMap
      assert(got.size === expected.size)
      expected.foreach { case (id, (nPrior, zOpt)) =>
        val (gotN, gotZ) = got(id)
        assert(gotN === nPrior, s"n_prior mismatch at $id")
        zOpt match {
          case Some(z) => assert(gotZ === z, s"z mismatch at $id")
          case None    => assert(gotZ.isNaN, s"expected unscored at $id")
        }
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
