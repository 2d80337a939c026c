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
}
