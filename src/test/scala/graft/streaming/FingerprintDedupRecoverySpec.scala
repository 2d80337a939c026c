package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** W5 for the exact-dedup gate: the INITIAL-STATE × restart interaction
  * plus ValueState and eviction timers across a kill/resume.
  *
  * Semantics pinned (Spark 4 `StatefulProcessorWithInitialState`):
  * initial state is applied ONCE, in the first batch of a fresh query —
  * on resume from a checkpoint it is NOT re-applied over recovered
  * store state, so a fingerprint added to the initial-state dataset
  * between runs is invisible to the restarted query (it labels `new`).
  * Recovered state must keep labeling: base keys stay `dup_of_base`,
  * run-1-discovered delta keys stay `dup_in_delta`, the delta key's
  * RESTORED eviction timer still fires once the watermark passes its
  * horizon, and nothing re-emits. */
class FingerprintDedupRecoverySpec extends AnyFunSuite with SparkSpec {

  test("initial state, ValueState and timers survive checkpoint restart") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("fpdedup_src")
    val cpDir = Files.createTempDirectory("fpdedup_cp").toString
    val outDir = Files.createTempDirectory("fpdedup_out").toString

    var nFiles = 0
    def addFile(rows: Seq[(Long, String, Long)]): Unit = {
      nFiles += 1
      val f = srcDir.resolve(s"f$nFiles.csv")
      Files.writeString(f,
        rows.map { case (id, fp, t) => s"$id,$fp,$t" }.mkString("\n"))
      // one file per micro-batch, consumed in write order (FileStream
      // source orders pending files by mtime)
      assert(f.toFile.setLastModified(1700000000000L + nFiles * 60000L))
    }

    // the initial-state dataset is rebuilt per run — exactly how a
    // production job would see a GROWN base index after a restart; the
    // run-2 delta ("B2") is what pins the no-re-application semantics
    def run(initialFps: Seq[String]): Unit = {
      val ds = spark.readStream
        .schema("docId LONG, fingerprint STRING, ts_ms LONG")
        .option("maxFilesPerTrigger", "1")
        .csv(srcDir.toString)
        .as[(Long, String, Long)]
        .map { case (id, fp, t) => DedupIn(id, fp, new java.sql.Timestamp(t)) }
        .withWatermark("ts", "1 second")
        .groupByKey(_.fingerprint)
        .transformWithState(new FingerprintDedupTracker(5000L),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append(),
          spark.createDataset(initialFps).groupByKey(identity).mapValues(_ => true))
      val q = ds.writeStream
        .option("checkpointLocation", cpDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[DedupOut], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def statuses(): Map[Long, String] = {
      val rows = spark.read.parquet(outDir).as[DedupOut].collect()
      assert(rows.map(_.docId).distinct.length === rows.length,
        s"a restart re-emitted rows: ${rows.toSeq}")
      rows.map(o => o.docId -> o.status).toMap
    }

    // run 1: base key traffic, a delta key sent twice
    addFile(Seq(
      (1L, "B", 10000L),  // in the initial base index
      (2L, "D", 10500L),  // first sight of a delta fingerprint
      (3L, "D", 11000L))) // duplicate within the delta
    run(initialFps = Seq("B"))
    assert(statuses() === Map(
      1L -> "dup_of_base", 2L -> "new", 3L -> "dup_in_delta"))

    // run 2 from the same checkpoint, with "B2" ADDED to the initial
    // dataset: recovered state must keep labeling B and D; B2 must NOT
    // be treated as base (initial state is not re-applied on restart)
    addFile(Seq(
      (4L, "B", 12000L),   // recovered base mark
      (5L, "D", 12500L),   // recovered delta ValueState — not "new"
      (6L, "B2", 13000L),  // the re-application probe
      (7L, "ADV", 30000L))) // watermark advancer -> 29s
    run(initialFps = Seq("B", "B2"))
    assert(statuses() === Map(
      1L -> "dup_of_base", 2L -> "new", 3L -> "dup_in_delta",
      4L -> "dup_of_base", 5L -> "dup_in_delta",
      6L -> "new", 7L -> "new"))

    // run 3: batch 1 fires D's RESTORED-then-refreshed timer (horizon
    // 12.5s + 5s ≤ watermark 29s) and evicts it; batch 2 re-admits D as
    // "new" while the base key B — which never evicts — still marks
    addFile(Seq((8L, "ADV2", 31000L)))
    addFile(Seq((9L, "D", 30500L), (10L, "B", 31000L)))
    run(initialFps = Seq("B", "B2"))
    assert(statuses() === Map(
      1L -> "dup_of_base", 2L -> "new", 3L -> "dup_in_delta",
      4L -> "dup_of_base", 5L -> "dup_in_delta",
      6L -> "new", 7L -> "new",
      8L -> "new", 9L -> "new", 10L -> "dup_of_base"))
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
