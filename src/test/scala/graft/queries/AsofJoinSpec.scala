package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** The as-of join's two contracts, pinned independently of the DuckDB
  * oracle: (1) semantics — a first-principles per-error scan of the raw
  * feed must reproduce every row, including the max-event_id tiebreak at
  * shared timestamps and NULLs for errors with no prior reading; (2) plan
  * shape — the union-tag formulation must plan NO join operator and
  * exactly two exchanges (the user_id hash for the carry window + the
  * presentation sort), because "as-of without a pair blowup" is the whole
  * point of the operator. */
class AsofJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact epoch micros — Timestamp.getTime is millisecond-resolution, so
    * subtract its integral-millis contribution from nanos before recombining. */
  private def micros(t: Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000L

  test("error_asof_reading matches a per-error scan of the raw feed") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value")).collect()
    case class Rd(eventId: Long, ts: Timestamp, sensor: String, vMicro: Long)
    val readings = ev
      .filter(r => r.getAs[String]("event_type") != "error" && !r.isNullAt(4))
      .map(r => r.getAs[Long]("user_id") -> Rd(
        r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("event_type"),
        BigDecimal(r.getAs[Double]("value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val errors = ev.filter(_.getAs[String]("event_type") == "error")

    val expected = errors.map { e =>
      val ts = e.getAs[Timestamp]("ts")
      // the as-of pick: max (ts, event_id) among readings with ts' <= ts
      val pick = readings.getOrElse(e.getAs[Long]("user_id"), Vector.empty)
        .filter(r => !r.ts.after(ts))
        .sortBy(r => (r.ts.getTime, r.eventId)).lastOption
      (e.getAs[Long]("event_id"), pick.map(_.sensor), pick.map(_.ts),
        pick.map(_.vMicro),
        pick.map(r => micros(ts) - micros(r.ts)))
    }.sortBy(_._1).toSeq

    val got = TimeSeriesQueries.errorAsofReading(spark, dir).collect().map { r =>
      (r.getAs[Long]("error_id"),
        Option(r.getAs[String]("sensor_id")),
        Option(r.getAs[Timestamp]("r_ts")),
        if (r.isNullAt(r.fieldIndex("v_micro"))) None
        else Some(r.getAs[Long]("v_micro")),
        if (r.isNullAt(r.fieldIndex("gap_us"))) None
        else Some(r.getAs[Long]("gap_us")))
    }.toSeq
    assert(got.nonEmpty)
    assert(got === expected)
    // the LEFT contract is exercised only if some error precedes every
    // reading of its user OR has a user with no readings — check we saw
    // at least one matched and note if the fixture has no unmatched rows
    assert(got.exists(_._2.isDefined), "no matched as-of rows — vacuous")
  }

  test("as-of plans no join and exactly two exchanges") {
    val plan = TimeSeriesQueries.errorAsofReading(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"expected 2 exchanges (user_id hash + presentation sort), got $exchanges:\n$plan")
  }
}
