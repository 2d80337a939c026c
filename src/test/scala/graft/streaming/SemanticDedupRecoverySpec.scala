package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** W5 for semantic near-dup discovery at ingest — the embedding twin of
  * [[LshDedupRecoverySpec]]: per-bucket ListState (full vectors + norms)
  * and the pending eviction timer across a kill/resume. Run 1 admits two
  * identical vectors (pair at cos 1.0); run 2 must pair a new arrival
  * against the RESTORED members with the exact recovered values, fire
  * the restored timer, and stay silent after eviction. */
class SemanticDedupRecoverySpec extends AnyFunSuite with SparkSpec {

  test("ListState and eviction timers survive checkpoint restart") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("semrec_src")
    val cpDir = Files.createTempDirectory("semrec_cp").toString
    val outDir = Files.createTempDirectory("semrec_out").toString

    // one fixed unit vector: every in-bucket pair scores cos6 = 1.0, so
    // a wrong recovered vector or norm shows up as a wrong VALUE, not
    // just a missing pair
    val emb = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    def row(id: Long, tsMs: Long, bucket: Long = 5L): String =
      s"""{"vecId":$id,"bucket":$bucket,""" +
        s""""emb":[${emb.mkString(",")}],"norm":1.0,"ts_ms":$tsMs}"""

    var nFiles = 0
    def addFile(rows: Seq[String]): Unit = {
      nFiles += 1
      val f = srcDir.resolve(s"f$nFiles.json")
      Files.writeString(f, rows.mkString("\n"))
      assert(f.toFile.setLastModified(1700000000000L + nFiles * 60000L))
    }

    def run(): Unit = {
      val ds = spark.readStream
        .schema("vecId LONG, bucket LONG, emb ARRAY<DOUBLE>, norm DOUBLE, ts_ms LONG")
        .option("maxFilesPerTrigger", "1")
        .json(srcDir.toString)
        .as[(Long, Long, Seq[Double], Double, Long)]
        .map { case (id, b, e, n, t) =>
          SemIn(id, b, e.toArray, n, new java.sql.Timestamp(t)) }
        .withWatermark("ts", "1 second")
        .groupByKey(_.bucket)
        .transformWithState(new SemanticDedupTracker(5000L),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = ds.writeStream
        .option("checkpointLocation", cpDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SemCandOut], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def pairs(): Set[(Long, Long)] = {
      val rows = spark.read.parquet(outDir).as[SemCandOut].collect()
      assert(rows.map(o => (o.aId, o.bId)).distinct.length === rows.length,
        s"a restart re-emitted a pair: ${rows.toSeq}")
      assert(rows.forall(_.cosSim === 1.0),
        s"recovered vectors scored wrong cosines: ${rows.toSeq}")
      rows.map(o => (o.aId, o.bId)).toSet
    }

    // run 1: vecs 1,2 in bucket 5 — pair at cos 1.0, timer armed at 15s
    addFile(Seq(row(1, 10000L), row(2, 11000L)))
    run()
    assert(pairs() === Set((1L, 2L)))

    // run 2 (same checkpoint): vec 3 joins the restored bucket + an
    // advancer elsewhere (watermark -> 29s); a second advancer batch
    // fires the RESTORED 15s timer and clears bucket 5; vec 4 then
    // arrives in the emptied bucket and must be silent
    addFile(Seq(row(3, 12000L), row(9990, 30000L, bucket = 6L)))
    addFile(Seq(row(9991, 31000L, bucket = 7L)))
    addFile(Seq(row(4, 32000L)))
    run()
    assert(pairs() === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "restored membership must pair vec 3; evicted bucket must not pair vec 4")
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
