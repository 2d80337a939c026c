package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Date-partitioned event layout: a day-filtered query must prune to the
  * matching partition directories at planning time (PartitionFilters),
  * not scan-and-discard. At 100 TB the date partition IS the difference
  * between reading a day and reading the lake. */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {

  test("day filter prunes partitions in the physical scan") {
    val out = Files.createTempDirectory("events_part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_date") === lit("2024-01-05"))
      .agg(count(lit(1)).as("n"))
    val n = q.head().getLong(0)
    assert(n > 0)

    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), "expected a partition-filtered scan")
    // the pruned file listing must touch only the selected partition
    val files = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString().split("\n"))
      .mkString("\n")
    assert(files.contains("event_date"), s"no partition column in scan:\n$files")

    // cross-check: pruned count equals the unpartitioned filter count
    val full = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) === lit("2024-01-05")).count()
    assert(n === full)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    // The 100 TB star-join case: the partition predicate isn't literal —
    // it comes from a filtered dimension. DPP injects the dim's key set
    // into the fact scan's partition filter at runtime, so only matching
    // partitions are read.
    val out = Files.createTempDirectory("events_dpp").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val dim = spark.range(0, 10).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'purchase' END AS event_type")
      .distinct()
      .filter(col("event_type") === "click")
    val fact = spark.read.parquet(out)
    val q = fact.join(dim, Seq("event_type")).agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic pruning in plan:\n${plan.take(2000)}")
    val n = q.head().getLong(0)
    val expect = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(n === expect)
  }
}
