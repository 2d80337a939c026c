package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance: small-file compaction. Long-running ingest (per-batch
  * appends, per-station fan-out) accretes files; scans then pay per-file
  * open + listing cost. Compaction rewrites a directory to ~`targetMB`
  * files. At 100 TB this runs per-partition as a scheduled job — the same
  * single-pass rewrite, bounded by the partition's size. */
object Maintenance {

  def compact(spark: SparkSession, dir: String, targetMB: Int = 128): Unit = {
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val tmp = dir.stripSuffix("/") + "__compact_tmp"
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap: rewrite target from the compacted copy
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dir)
    delete(new java.io.File(tmp))
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }
}
