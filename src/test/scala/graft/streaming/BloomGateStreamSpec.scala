package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch↔stream equivalence for the Bloom ingest gate: the same delta
  * docs played through [[BloomGate.probe]] across scrambled micro-batches
  * must reproduce the DuckDB-oracled `bloom_incremental_dedup` decision
  * per doc exactly (including its oracled false positives), and the gate
  * must bound the downstream dedup's state store to its pass-throughs —
  * the constant-memory ingest claim, exercised with state accounting. */
class BloomGateStreamSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus() = graft.sources.Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))
    .collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))

  private def bitsFromBase() = {
    val base = graft.sources.Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) < 8)
      .select(graft.functions.TextFunctions.fingerprint(col("text"))
        .as("fingerprint"))
    BloomGate.buildBits(base)
  }

  test("streaming gate ≡ batch bloom_incremental_dedup across scrambled micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val expected = graft.queries.DedupQueries.bloomIncrementalDedup(spark, dir)
      .select("doc_id", "bloom_hit", "exact_dup").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("bloom_hit"), r.getAs[Boolean]("exact_dup")))
      .toMap
    val bits = bitsFromBase()
    val delta = corpus().filter(_._1 % 10 >= 8)

    val rnd = new scala.util.Random(17)
    val (d1, d2) = rnd.shuffle(delta.toSeq).splitAt(delta.length / 2)
    val input = MemoryStream[(Long, String)]
    val gated = input.toDF().toDF("doc_id", "text")
      .withColumn("fingerprint",
        graft.functions.TextFunctions.fingerprint(col("text")))
      .withColumn("bloom_hit", BloomGate.probe(bits, col("fingerprint")))
      .select("doc_id", "bloom_hit")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("bloomgate").start()
    try {
      input.addData(d1)
      q.processAllAvailable()
      input.addData(d2)
      q.processAllAvailable()
      val got = spark.table("bloomgate").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("bloom_hit"))
        .toMap
      assert(got.size === expected.size)
      expected.foreach { case (id, (hit, exactDup)) =>
        assert(got(id) === hit, s"gate decision diverged from batch at doc $id")
        // the Bloom guarantee, streaming edition: no false negatives
        if (exactDup) assert(got(id), s"false NEGATIVE at doc $id")
      }
    } finally q.stop()
  }

  test("gate bounds the downstream dedup state to its pass-throughs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val bits = bitsFromBase()
    val delta = corpus().filter(_._1 % 10 >= 8)
    val expectHits = graft.queries.DedupQueries
      .bloomIncrementalDedup(spark, dir)
      .filter(col("bloom_hit")).count()

    val rnd = new scala.util.Random(23)
    val (d1, d2) = rnd.shuffle(delta.toSeq).splitAt(delta.length / 2)
    val input = MemoryStream[(Long, String)]
    // gated ingest: only POSSIBLE duplicates reach the stateful exact
    // dedup; definite-new docs bypass it entirely
    val deduped = input.toDF().toDF("doc_id", "text")
      .withColumn("fingerprint",
        graft.functions.TextFunctions.fingerprint(col("text")))
      .withColumn("bloom_hit", BloomGate.probe(bits, col("fingerprint")))
      .filter(col("bloom_hit"))
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("fingerprint")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("bloomgate_dedup").start()
    try {
      input.addData(d1)
      q.processAllAvailable()
      input.addData(d2)
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).max
      // state never exceeds the gate's pass-throughs — and the gate
      // passes a strict subset of the batch (the oracled FP regime is
      // ~10%, far below pass-everything)
      assert(stateRows <= expectHits,
        s"state $stateRows exceeds gate pass-throughs $expectHits")
      assert(expectHits < delta.length,
        "gate degenerated to pass-everything — no state saving to claim")
      val emitted = spark.table("bloomgate_dedup").count()
      assert(emitted > 0 && emitted <= expectHits)
    } finally q.stop()
  }
}
