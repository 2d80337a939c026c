package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for EXACT incremental dedup: the delta
  * slice of the documents corpus played through
  * [[FingerprintDedupTracker]] — base fingerprints pre-loaded as
  * transformWithState INITIAL state, delta docs split into docId-ordered
  * micro-batches scrambled WITHIN each batch — must emit exactly the
  * (doc_id, fingerprint, status) rows of the DuckDB-oracled batch
  * `incremental_dedup` query. A second leg pins the bounded-state trade:
  * once the watermark passes a stream-discovered fingerprint's
  * retention horizon its key is evicted, and a re-sent duplicate
  * reports `new` again (the `dropDuplicatesWithinWatermark` bound). */
class StreamingExactDedupSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("tracker reproduces incremental_dedup across scrambled micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      // the harness documents carry no exact duplicates (every delta doc
      // labels `new`, which would leave the three-way labeling vacuous)
      // — seed the corpus with real ones: base docs replayed into the
      // delta slice (→ dup_of_base) and fresh texts sent twice inside
      // the delta (→ new + dup_in_delta). Ids are chosen so the copies
      // land in the doc_id % 10 >= 8 slice the batch query calls delta.
      val d0 = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val baseReplays = d0
        .filter(pmod(col("doc_id"), lit(10)) < 8 && col("doc_id") < 40)
        .select((col("doc_id") * 100 + 10008).as("doc_id"), col("text"))
      val freshTwice = d0.filter(col("doc_id") < 5)
        .select(col("doc_id"), concat(col("text"), lit(" zqx unseen")).as("text"))
      val docs = d0
        .unionAll(baseReplays)
        .unionAll(freshTwice.select((col("doc_id") * 10 + 20008).as("doc_id"), col("text")))
        .unionAll(freshTwice.select((col("doc_id") * 10 + 30008).as("doc_id"), col("text")))
      val batch = graft.queries.DedupQueries.incrementalDedupFrom(spark, docs)
        .as[(Long, String, String)].collect().toSet

      val fps = docs
        .withColumn("fingerprint",
          graft.functions.TextFunctions.fingerprint(col("text")))
      val baseInit = fps.filter(pmod(col("doc_id"), lit(10)) < 8)
        .select(col("fingerprint")).distinct().as[String]
        .groupByKey(identity).mapValues(_ => true)
      // delta feed in docId order ACROSS batches (the cross-batch
      // ordering contract), scrambled within each batch; event times
      // stay off zero (initial watermark is 0)
      val delta = fps.filter(pmod(col("doc_id"), lit(10)) >= 8)
        .select(col("doc_id"), col("fingerprint"))
        .as[(Long, String)].collect().sortBy(_._1)
        .map { case (id, fp) => DedupIn(id, fp, new Timestamp(1000000L + id)) }
      val thirds = delta.grouped((delta.length + 2) / 3).toSeq
      val rnd = new scala.util.Random(43)

      val input = MemoryStream[DedupIn]
      val labeled = input.toDS()
        .withWatermark("ts", "10 minutes")
        .groupByKey(_.fingerprint)
        .transformWithState(new FingerprintDedupTracker(86400000L),
          TimeMode.EventTime(), OutputMode.Append(), baseInit)
      val q = labeled.writeStream.outputMode("append")
        .format("memory").queryName("dedupstream").start()
      try {
        thirds.foreach { b =>
          input.addData(rnd.shuffle(b.toSeq))
          q.processAllAvailable()
        }
        val got = spark.table("dedupstream").as[DedupOut].collect()
          .map(o => (o.docId, o.fingerprint, o.status)).toSet
        assert(got === batch, "streamed label set != batch incremental_dedup")
        // the three-way labeling did real work: every status present
        assert(got.map(_._3) === Set("new", "dup_of_base", "dup_in_delta"))
      } finally q.stop()
    }
  }

  test("watermark eviction forgets a delta fingerprint after retention") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      val emptyInit = spark.emptyDataset[String]
        .groupByKey(identity).mapValues(_ => true)
      val input = MemoryStream[DedupIn]
      val labeled = input.toDS()
        .withWatermark("ts", "1 second")
        .groupByKey(_.fingerprint)
        .transformWithState(new FingerprintDedupTracker(5000L),
          TimeMode.EventTime(), OutputMode.Append(), emptyInit)
      val q = labeled.writeStream.outputMode("append")
        .format("memory").queryName("dedupevict").start()
      try {
        def send(rows: DedupIn*): Unit = {
          input.addData(rows.toSeq); q.processAllAvailable()
        }
        send(DedupIn(1, "X", new Timestamp(10000L)))
        // still inside the retention horizon: an exact dup is caught
        send(DedupIn(2, "X", new Timestamp(11000L)))
        // advance the watermark far past X's lastSeen + retention …
        send(DedupIn(3, "adv", new Timestamp(100000L)))
        // … let X's timer fire (timers run on the following batch) …
        send(DedupIn(4, "adv2", new Timestamp(101000L)))
        // … and the SAME fingerprint is `new` again: the key was evicted
        send(DedupIn(5, "X", new Timestamp(102000L)))
        val got = spark.table("dedupevict").as[DedupOut].collect()
          .filter(_.fingerprint == "X").sortBy(_.docId)
          .map(o => (o.docId, o.status)).toSeq
        assert(got === Seq((1L, "new"), (2L, "dup_in_delta"), (5L, "new")),
          "expected evict-then-readmit; state was not watermark-bounded")
      } finally q.stop()
    }
  }
}
