package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.DedupOps

/** W5 for LSH near-dup discovery at ingest: the per-bucket ListState
  * membership AND the pending eviction timer must survive a kill/resume.
  * Run 1 admits two colliding docs (pair emitted) and leaves their
  * eviction timer armed; run 2 from the same checkpoint must (a) pair a
  * new arrival against the RESTORED membership without re-emitting
  * run 1's pair, (b) fire the RESTORED timer once the watermark passes
  * the horizon, and (c) stay silent for a post-eviction arrival.
  *
  * The scenario runs under BOTH checkpoint modes (r12): the provider's
  * snapshot-per-commit default AND changelog checkpointing — the
  * deployment setting [[StateStoreDefaults]] recommends — whose restore
  * path differs (last snapshot + changelog tail replay instead of a
  * whole-store snapshot load), so the recommendation is proven against
  * kill/resume, not assumed from the throughput A/B alone. */
class LshDedupRecoverySpec extends AnyFunSuite with SparkSpec {

  private def recoveryScenario(changelog: Boolean): Unit = {
    import spark.implicits._
    StateStoreDefaults.rocksDb(spark, changelog = changelog)
    val srcDir = Files.createTempDirectory("lshrec_src")
    val cpDir = Files.createTempDirectory("lshrec_cp").toString
    val outDir = Files.createTempDirectory("lshrec_out").toString

    // fabricated banded rows: the tracker keys on (band, bandKey) and
    // compares signature positions — identical sigs in one bucket model
    // an exact-dup clique without needing the md5 pipeline
    val sig = Seq.fill(DedupOps.NumHashes)(7L)
    def row(id: Long, tsMs: Long, bucket: String = "k0"): String =
      s"""{"docId":$id,"band":0,"bandKey":"$bucket",""" +
        s""""sig":[${sig.mkString(",")}],"ts_ms":$tsMs}"""

    var nFiles = 0
    def addFile(rows: Seq[String]): Unit = {
      nFiles += 1
      val f = srcDir.resolve(s"f$nFiles.json")
      Files.writeString(f, rows.mkString("\n"))
      assert(f.toFile.setLastModified(1700000000000L + nFiles * 60000L))
    }

    def run(): Unit = {
      val ds = spark.readStream
        .schema("docId LONG, band INT, bandKey STRING, sig ARRAY<LONG>, ts_ms LONG")
        .option("maxFilesPerTrigger", "1")
        .json(srcDir.toString)
        .as[(Long, Int, String, Seq[Long], Long)]
        .map { case (id, b, k, s, t) =>
          LshIn(id, b, k, s.toArray, new java.sql.Timestamp(t)) }
        .withWatermark("ts", "1 second")
        .groupByKey(r => s"${r.band}:${r.bandKey}")
        .transformWithState(new LshDedupTracker(5000L),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = ds.writeStream
        .option("checkpointLocation", cpDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[LshCandOut], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def pairs(): Set[(Long, Long)] = {
      val rows = spark.read.parquet(outDir).as[LshCandOut].collect()
      assert(rows.map(o => (o.band, o.aId, o.bId)).distinct.length === rows.length,
        s"a restart re-emitted a (band, pair): ${rows.toSeq}")
      assert(rows.forall(_.nMatch === DedupOps.NumHashes))
      rows.map(o => (o.aId, o.bId)).toSet
    }

    try {
      // run 1: docs 1,2 collide — pair emitted, timer armed at 15s
      addFile(Seq(row(1, 10000L), row(2, 11000L)))
      run()
      assert(pairs() === Set((1L, 2L)))

      // run 2, three micro-batches from the same checkpoint:
      //   f2 — doc 3 joins the RESTORED bucket (pairs with 1 AND 2; the
      //        re-armed horizon stays min-member 10s + 5s = 15s) and an
      //        advancer in another bucket pushes the watermark to 29s
      //   f3 — a second advancer batch lets the restored 15s timer fire:
      //        every k0 member is past horizon, the bucket clears
      //   f4 — doc 4 arrives in the emptied bucket: silence
      addFile(Seq(row(3, 12000L), row(9990, 30000L, bucket = "adv")))
      addFile(Seq(row(9991, 31000L, bucket = "adv2")))
      addFile(Seq(row(4, 32000L)))
      run()
      assert(pairs() === Set((1L, 2L), (1L, 3L), (2L, 3L)),
        "restored membership must pair doc 3; evicted bucket must not pair doc 4")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(StateStoreDefaults.ChangelogConf)
    }
  }

  test("ListState and eviction timers survive checkpoint restart") {
    recoveryScenario(changelog = false)
  }

  test("the same restart semantics hold under changelog checkpointing") {
    recoveryScenario(changelog = true)
  }
}
