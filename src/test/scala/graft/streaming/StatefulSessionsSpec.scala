package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.StatefulSessions._

/** flatMapGroupsWithState sessionizer vs the session_window semantics. */
class StatefulSessionsSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L
  private def ev(user: Long, offsetSec: Long) = Ev(user, new Timestamp(t0 + offsetSec * 1000))

  test("sessions close on gap and on watermark timeout; counts and bounds match") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val gapMs = 60000L // 1 minute
    val input = MemoryStream[Ev]
    val q = sessionize(spark, input.toDS(), gapMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: burst of 3 events within the gap, then silence
      input.addData(ev(1, 0), ev(1, 10), ev(1, 20))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // session still open

      // next event beyond the gap: closes session 1, opens session 2;
      // also advances the watermark
      input.addData(ev(1, 200))
      q.processAllAvailable()
      val s1 = spark.table("sessions").as[Session].collect()
      assert(s1.length === 1)
      assert(s1(0).n_events === 3)
      assert(s1(0).session_start.getTime === t0)
      assert(s1(0).session_end.getTime === t0 + 20 * 1000 + gapMs)

      // advance watermark far past session 2's timeout: closes via timeout
      input.addData(ev(2, 1000))
      q.processAllAvailable()
      input.addData(ev(2, 2000)) // push watermark again so timeout fires
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect().sortBy(_.session_start.getTime)
      val u1 = all.filter(_.user_id === 1)
      assert(u1.length === 2)
      assert(u1(1).n_events === 1)
      assert(u1(1).session_end.getTime === t0 + 200 * 1000 + gapMs)
    } finally q.stop()
  }
}
