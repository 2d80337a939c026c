package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for timer-based sessionization: the raw
  * event feed played through [[TimerSessionTracker]] (event-time
  * timers, 30-min gap) across chronological micro-batches — scrambled
  * WITHIN each batch — must close exactly the session set the
  * DuckDB-oracled batch `user_sessions` query produces, including the
  * TRAILING session of every user, which only a timer can close (no
  * later event ever arrives). A sentinel user's far-future event pushes
  * the watermark past every real session end at the finale. */
class TimerSessionSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val GapMs = 30L * 60 * 1000
  private val Sentinel = -1L

  test("TimerSessionTracker reproduces user_sessions exactly, timers closing trailers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val batch = graft.queries.RelationalQueries.queries("user_sessions")(spark, dir)
      .selectExpr("user_id", "unix_millis(session_start) AS s_ms",
        "unix_millis(session_end) AS e_ms", "n_events")
      .as[(Long, Long, Long, Long)]
      .collect().toSet

    val feed = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "ts")
      .as[(Long, Timestamp)]
      .collect()
      .map { case (u, ts) => SessIn(u, ts) }
      .sortBy(_.ts.getTime)
    val maxTs = feed.map(_.ts.getTime).max

    val thirds = feed.grouped((feed.length + 2) / 3).toSeq
    val rnd = new scala.util.Random(23)
    val input = MemoryStream[SessIn]
    val sessions = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .transformWithState(new TimerSessionTracker(GapMs),
        TimeMode.EventTime(), OutputMode.Append())
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("timersessions").start()
    try {
      thirds.foreach { b =>
        input.addData(rnd.shuffle(b.toSeq))
        q.processAllAvailable()
      }
      // mid-stream sanity: nothing emitted that the batch query doesn't have
      val mid = spark.table("timersessions").as[SessOut].collect()
        .map(o => (o.userId, o.startMs, o.endMs, o.nEvents)).toSet
      assert(mid.subsetOf(batch), "streamed a session the batch query lacks")

      // the finale: a sentinel event far past every session end advances
      // the watermark so every trailing timer fires
      input.addData(SessIn(Sentinel, new Timestamp(maxTs + 4 * GapMs)))
      q.processAllAvailable()

      val got = spark.table("timersessions").as[SessOut].collect()
        .filter(_.userId != Sentinel)
        .map(o => (o.userId, o.startMs, o.endMs, o.nEvents)).toSet
      assert(got === batch, "closed-session set != batch user_sessions")
      // timers did real work: some sessions were NOT closed by a
      // successor event (each user's last session has no successor)
      assert(got.size > mid.size,
        "no trailing session was closed by a timer — the timer leg is untested")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a late above-watermark in-gap event MERGES sessions instead of splitting") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the ADVICE scenario: gap 30 min, watermark delay 10 min. Batch 1
    // delivers t=0 and t=35min (gap-crossing: a naive tracker closes
    // [0, 30min) inline). Batch 2 delivers t=28min — ABOVE the watermark
    // (25min after batch 1) yet inside BOTH sessions' gap windows, so
    // the batch session_window semantics give ONE session covering all
    // three events. The tracker must buffer, merge, and emit exactly
    // that — never the premature [0, 30min) split.
    val min = 60L * 1000
    val base = 100 * min // off zero: ts=0 is not above the initial watermark
    val u = 7L
    def ev(user: Long, tMs: Long) = SessIn(user, new Timestamp(base + tMs))

    val input = MemoryStream[SessIn]
    val sessions = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .transformWithState(new TimerSessionTracker(30 * min),
        TimeMode.EventTime(), OutputMode.Append())
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("latemerge").start()
    try {
      input.addData(ev(u, 0), ev(u, 35 * min))
      q.processAllAvailable()
      input.addData(ev(u, 28 * min)) // late (wm = 25min) but mergeable
      q.processAllAvailable()
      assert(spark.table("latemerge").where(s"userId = $u").isEmpty,
        "a session closed before the watermark passed its end")
      // flush: push the watermark far past every pending end
      input.addData(ev(Sentinel, 500 * min))
      q.processAllAvailable()
      val got = spark.table("latemerge").as[SessOut].collect()
        .filter(_.userId == u)
        .map(o => (o.startMs - base, o.endMs - base, o.nEvents)).toSet
      assert(got === Set((0L, 65 * min, 3L)),
        s"expected the single merged session [0, 65min) x3, got $got")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
