package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.FunnelTracker.{FunnelEv, FunnelHit}

/** Streaming funnel semantics: completion requires the ORDERED
  * progression (same rule as the batch conversion_funnel), exactly one
  * emission per completing user, and cross-batch state carry. */
class FunnelTrackerSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L
  private def ts(s: Long) = new Timestamp(t0 + s * 1000)

  test("ordered completions emit once; out-of-order and partial funnels never do") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[FunnelEv]
    val q = FunnelTracker.track(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funnel_hits")
      .start()
    try {
      input.addData(
        // user 1: clean ordered funnel inside one batch
        FunnelEv(1, "view", ts(0)), FunnelEv(1, "click", ts(10)), FunnelEv(1, "purchase", ts(20)),
        // user 2: purchase BEFORE click — must never complete
        FunnelEv(2, "view", ts(0)), FunnelEv(2, "purchase", ts(5)), FunnelEv(2, "click", ts(10)),
        // user 3: view only
        FunnelEv(3, "view", ts(0)),
        // user 4: starts here, completes next batch
        FunnelEv(4, "view", ts(0)), FunnelEv(4, "click", ts(30)))
      q.processAllAvailable()
      // user 4 completes across the batch boundary (state carried);
      // user 1 runs an ENTIRE second funnel — the done-tombstone must
      // swallow it (each user counts once, like the batch twin)
      input.addData(
        FunnelEv(4, "purchase", ts(60)),
        FunnelEv(1, "view", ts(90)), FunnelEv(1, "click", ts(95)),
        FunnelEv(1, "purchase", ts(99)))
      q.processAllAvailable()

      val hits = spark.table("funnel_hits").as[FunnelHit].collect()
      assert(hits.map(_.user_id).sorted.toSeq === Seq(1L, 4L))
      val u1 = hits.find(_.user_id == 1L).get
      assert(u1.t_view === ts(0) && u1.t_click === ts(10) && u1.t_purchase === ts(20))
      val u4 = hits.find(_.user_id == 4L).get
      assert(u4.t_purchase === ts(60))
    } finally q.stop()
  }
}
