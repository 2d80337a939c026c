package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance: small-file compaction. Long-running ingest (per-batch
  * appends, per-station fan-out) accretes files; scans then pay per-file
  * open + listing cost. Compaction rewrites a directory to ~`targetMB`
  * files. At 100 TB this runs per-partition as a scheduled job — the same
  * single-pass rewrite, bounded by the partition's size. */
object Maintenance {

  /** Compact `dir` to ~targetMB files. The swap is two directory renames
    * (write tmp → move dir to dir__old → move tmp to dir → delete
    * dir__old), so a crash at any point leaves a complete copy of the
    * data on disk: before the first rename the original is untouched;
    * between the renames the compacted tmp is complete; after, the target
    * is complete. Readers concurrent with the rename window can still
    * observe a missing directory for an instant — like the reference's
    * batch appends, this is a maintenance op to schedule off-peak, not a
    * transactional commit (that would need a table format's metadata
    * layer, out of scope per SURVEY §7). */
  def compact(spark: SparkSession, dir: String, targetMB: Int = 128): Unit = {
    val base = dir.stripSuffix("/")
    val tmp = new java.io.File(base + "__compact_tmp")
    val old = new java.io.File(base + "__compact_old")
    val target = new java.io.File(base)
    // recovery from a crash BETWEEN the two renames: the live dir is
    // missing but the moved-aside original exists — restore it first
    if (!target.exists() && old.exists() && !old.renameTo(target))
      throw new java.io.IOException(s"compact: cannot restore $old to $target")
    delete(tmp); delete(old) // leftovers from a previous crashed run
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    if (!target.renameTo(old))
      throw new java.io.IOException(s"compact: cannot move $target aside")
    if (!tmp.renameTo(target)) {
      old.renameTo(target) // roll back so the original stays readable
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }
}
