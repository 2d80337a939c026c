package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Native session_window in STREAMING mode — the merging-window state
  * path (sessions extend/merge as events arrive; append-mode emission
  * only after the watermark passes session end + gap). The batch form is
  * oracled as `user_sessions`; the custom-state equivalent is
  * StatefulSessions. */
class StreamingSessionWindowSpec extends AnyFunSuite with SparkSpec {

  private val t0 = 1700000000000L

  test("sessions merge within gap and finalize after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val sessions = input.toDS().toDF("user", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user"),
        col("session_window.start").cast("long").as("start_s"),
        col("session_window.end").cast("long").as("end_s"),
        col("n"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      // two events 5s apart -> ONE merged session [t0, t0+15s)
      input.addData(("u1", t0), ("u1", t0 + 5000))
      q.processAllAvailable()
      assert(spark.table("stream_sessions").isEmpty,
        "session must not emit before the watermark passes its end")
      // advancer pushes the watermark past the session end
      input.addData(("u2", t0 + 60000))
      q.processAllAvailable()
      val rows = spark.table("stream_sessions")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq === Seq(("u1", t0 / 1000, t0 / 1000 + 15, 2L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
