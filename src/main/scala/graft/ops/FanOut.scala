package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K3–K5 (consumer.py:180-208): route each station's rows to a per-station
  * destination, append-only.
  *
  * The reference does this with a driver-side `distinct().collect()` loop
  * plus one filtered write per station over a cached batch — N extra scans
  * and a driver round-trip per batch (SURVEY.md §7.5 risk 6). At 100 TB /
  * thousands of stations that loop IS the bottleneck, so the primary
  * implementation is writer-level `partitionBy`: single distributed pass,
  * one directory per station, identical destination semantics
  * (`station_id=<id>/` ↔ collection `station_<id>`).
  *
  * The faithful-mechanics variant is kept for semantic comparison in
  * tests (and as the shape a per-collection sink like MongoDB would need
  * inside foreachBatch), cache+unpersist included.
  */
object FanOut {

  /** Scalable fan-out: one pass, partitioned layout. */
  def writePartitioned(df: DataFrame, outDir: String): Unit =
    df.write.mode("append").partitionBy("station_id").parquet(outDir)

  /** Small-files-aware fan-out: repartition by the partition column first
    * so each station directory gets ONE file per batch instead of one per
    * upstream task (T tasks × S stations tiny files is the classic
    * partitioned-write pathology; at 100 TB it poisons the downstream
    * scan's file listing). */
  def writePartitionedSized(df: DataFrame, outDir: String): Unit =
    df.repartition(col("station_id"))
      .write.mode("append").partitionBy("station_id").parquet(outDir)

  /** Exactly-once fan-out for foreachBatch sinks: station-partitioned
    * like [[writePartitionedSized]], with the micro-batch id as a
    * secondary partition column under DYNAMIC partition overwrite.
    * Structured Streaming replays a failed batch under the SAME batchId,
    * so a replay overwrites exactly the `station_id=S/batch_id=N`
    * directories the crashed attempt wrote — never appending a duplicate
    * and never touching other batches' output. Combined with
    * `isolateFailedBatches = false` (at-least-once replay) this is the
    * end-to-end exactly-once recipe proved in ErrorIsolationSpec.
    * Station-major layout keeps the fan-out read contract: scanning
    * `station_id=S/` yields that station's full history. */
  def writePartitionedIdempotent(batch: DataFrame, outDir: String, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .repartition(col("station_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("station_id", "batch_id")
      .parquet(outDir)

  /** Reference-mechanics fan-out (K3 cache, K4 distinct-collect, K5
    * filtered per-station append). Test-scale / per-collection sinks only. */
  def writePerStationLoop(batch: DataFrame, outDir: String): Unit = {
    val cached = batch.cache()
    try {
      val stations = cached.select(col("station_id")).distinct()
        .collect().map(_.getString(0))
      stations.foreach { id =>
        cached.filter(col("station_id") === id)
          .write.mode("append").parquet(s"$outDir/station_$id")
      }
    } finally cached.unpersist()
  }
}
