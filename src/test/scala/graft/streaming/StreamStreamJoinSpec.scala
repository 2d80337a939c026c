package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Stream-stream interval join: purchases matched to the clicks that
  * preceded them within 10 minutes, both sides watermarked so join state
  * is bounded (the scale requirement: unwatermarked stream-stream joins
  * grow state without limit). */
case class Click(user_id: Long, click_ts: Timestamp)
case class Purchase(user_id: Long, purchase_ts: Timestamp)

class StreamStreamJoinSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L
  private def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  test("interval join matches purchases to recent clicks only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = clicks.toDS().withWatermark("click_ts", "1 minute").as("clicks")
      .join(
        purchases.toDS().withWatermark("purchase_ts", "1 minute").as("purchases"),
        expr("""clicks.user_id = purchases.user_id AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 10 minutes""".stripMargin))
      .select(col("clicks.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cp").start()
    try {
      clicks.addData(Click(1, ts(0)), Click(2, ts(0)))
      purchases.addData(Purchase(1, ts(300)))   // 5 min after click: match
      purchases.addData(Purchase(2, ts(6000)))  // 100 min after: no match
      q.processAllAvailable()
      val rows = spark.table("cp").select(col("user_id")).collect().map(_.getLong(0))
      assert(rows.toSeq === Seq(1L))
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = clicks.toDS().withWatermark("click_ts", "10 seconds").as("c")
      .join(
        purchases.toDS().withWatermark("purchase_ts", "10 seconds").as("p"),
        expr("""c.user_id = p.user_id AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 30 seconds""".stripMargin),
        "left_outer")
      .select(col("c.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cp_outer").start()
    try {
      clicks.addData(Click(1, ts(0)), Click(2, ts(0)))
      purchases.addData(Purchase(1, ts(5))) // user 1 converts; user 2 doesn't
      q.processAllAvailable()
      // matched row can emit immediately; the NULL row for user 2 must
      // wait until the watermark proves no purchase can still arrive
      clicks.addData(Click(9, ts(120)))          // advance click watermark
      purchases.addData(Purchase(9, ts(121)))    // advance purchase watermark
      q.processAllAvailable()
      val rows = spark.table("cp_outer")
        .filter(col("user_id").isin(1L, 2L))
        .collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
      assert(rows(1L).isDefined, "matched click must carry its purchase")
      assert(rows(2L).isEmpty, "unmatched click must emit with NULL purchase")
    } finally q.stop()
  }

  /** The production error-context join: streamed pairs must equal the
    * batch twin's join (the pre-aggregation frame of the oracled
    * `error_context_join` entry) on the same corpus. Chronological
    * micro-batches mean no row is later than the watermark delay, and
    * the eviction horizon (watermark − range) then PROVES no emittable
    * pair's partner state is dropped early — so stream ≡ batch exactly. */
  test("IntervalJoin.errorContext ≡ batch twin pairs across chronological micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val errRows = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"))).sortBy(_._3.getTime)
    val rdRows = ev.filter(col("event_type") =!= "error" && col("value").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Timestamp]("ts"), r.getAs[Long]("vm"))).sortBy(_._3.getTime)

    val expected = {
      val err = errRows.toSeq.toDF("error_id", "user_id", "error_ts")
      val rd = rdRows.toSeq.toDF("r_user", "sensor_id", "r_ts", "v_micro")
      err.join(rd, col("user_id") === col("r_user") &&
          col("r_ts") >= col("error_ts") - expr("INTERVAL 5 MINUTES") &&
          col("r_ts") <= col("error_ts") + expr("INTERVAL 5 MINUTES"))
        .select("error_id", "sensor_id", "r_ts", "v_micro").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
    }
    assert(expected.nonEmpty, "fixture has no in-range pairs — vacuous")

    val errors = MemoryStream[(Long, Long, Timestamp)]
    val readings = MemoryStream[(Long, String, Timestamp, Long)]
    val joined = IntervalJoin.errorContext(
      errors.toDS().toDF("error_id", "user_id", "error_ts"),
      readings.toDS().toDF("user_id", "sensor_id", "r_ts", "v_micro"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("errctx").start()
    try {
      // three chronological chunks per side, split at the global time
      // terciles so both streams' watermarks advance together
      val cut = rdRows.map(_._3.getTime)
      val (t1, t2) = (cut(cut.length / 3), cut(2 * cut.length / 3))
      Seq[Long => Boolean](_ <= t1, t => t > t1 && t <= t2, _ > t2)
        .foreach { in =>
          errors.addData(errRows.filter(r => in(r._3.getTime)).toSeq)
          readings.addData(rdRows.filter(r => in(r._3.getTime)).toSeq)
          q.processAllAvailable()
        }
      val got = spark.table("errctx")
        .select("error_id", "sensor_id", "r_ts", "v_micro").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("both sides' join state is evicted once the watermark passes the range") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val errors = MemoryStream[(Long, Long, Timestamp)]
    val readings = MemoryStream[(Long, String, Timestamp, Long)]
    val joined = IntervalJoin.errorContext(
      errors.toDS().toDF("error_id", "user_id", "error_ts"),
      readings.toDS().toDF("user_id", "sensor_id", "r_ts", "v_micro"),
      delay = "1 minute")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("errctx_state").start()
    try {
      def stateRows(): Long =
        Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
          .map(_.numRowsTotal).sum
      // load: 200 readings + 2 errors in one tight window
      readings.addData((0 until 200).map(i => (1L, "s1", ts(i), i.toLong)))
      errors.addData((1L, 1L, ts(50)), (2L, 1L, ts(150)))
      q.processAllAvailable()
      val loaded = stateRows()
      assert(loaded >= 200L, s"expected both sides buffered, state=$loaded")
      // advance event time on BOTH streams by 2 h: the watermark passes
      // every loaded row's eviction horizon (ts + 5 min range + 1 min
      // delay), so the state store must shed the old rows. The extra
      // trailing batch lets the purge (computed from the PREVIOUS
      // batch's max event time) actually run.
      errors.addData((3L, 9L, ts(7200)))
      readings.addData((9L, "s9", ts(7201), 0L))
      q.processAllAvailable()
      errors.addData((4L, 9L, ts(7300)))
      readings.addData((9L, "s9", ts(7301), 0L))
      q.processAllAvailable()
      val drained = stateRows()
      assert(drained < 10L,
        s"watermark advanced 2h past the range but state still holds $drained rows " +
          s"(was $loaded) — eviction is not bounding the join")
    } finally q.stop()
  }
}
