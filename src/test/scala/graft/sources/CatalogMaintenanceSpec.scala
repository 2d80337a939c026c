package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CatalogMaintenanceSpec extends AnyFunSuite with SparkSpec {

  test("SQL front door: tables and derived views answer plain SQL") {
    GraftCatalog.registerViews(spark, "/root/testdata/sf0.001")
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC LIMIT 3""".stripMargin).collect()
    assert(joined.length === 3 && joined.head.getLong(1) > 0)

    val clean = spark.sql("SELECT count(*) FROM clean_corpus").head().getLong(0)
    assert(clean > 0)
    val windows = spark.sql(
      "SELECT count(*) FROM sensor_windowed_metrics WHERE malformed_count > 0")
      .head().getLong(0)
    assert(windows > 0)
  }

  test("compaction collapses a many-file directory, preserving rows") {
    val dir = Files.createTempDirectory("compact").toString
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
    df.repartition(40).write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 40)
    Maintenance.compact(spark, dir, targetMB = 128)
    assert(parquetFiles < before / 4, s"still $parquetFiles files")
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.agg(sum(col("id"))).head().getLong(0) === (0L until 10000L).sum)
  }

  test("compaction recovers when a crash hit between the two renames") {
    // worst-case crash point: original moved aside, compacted copy not
    // yet in place -> live dir missing. compact() must restore and go on.
    val dir = Files.createTempDirectory("compact_midswap").toString
    spark.range(300).write.mode("overwrite").parquet(dir)
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "__compact_old")))
    spark.range(2).write.parquet(dir + "__compact_tmp") // stale partial copy
    Maintenance.compact(spark, dir, targetMB = 128)
    assert(spark.read.parquet(dir).count() === 300)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
  }

  test("compaction survives leftovers from a crashed previous run") {
    val dir = Files.createTempDirectory("compact_crash").toString
    val df = spark.range(500).select(col("id"))
    df.repartition(8).write.mode("overwrite").parquet(dir)
    // simulate a prior run that died mid-swap: stale tmp + old copies
    spark.range(3).write.parquet(dir + "__compact_tmp")
    spark.range(5).write.parquet(dir + "__compact_old")
    Maintenance.compact(spark, dir, targetMB = 128)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(!new java.io.File(dir + "__compact_tmp").exists(), "tmp not cleaned")
    assert(!new java.io.File(dir + "__compact_old").exists(), "old not cleaned")
  }
}
