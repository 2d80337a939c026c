package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst plan-shape guarantees the engine relies on at scale. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  test("join strategy hints are honored (merge vs broadcast)") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.lineitem(spark, dir)
    val o = graft.sources.Tables.orders(spark, dir)

    val merged = li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    assert(merged.queryExecution.executedPlan.toString.contains("SortMergeJoin"))

    val bcast = li.join(o.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("nested schema pruning reaches the parquet scan") {
    val dir = Files.createTempDirectory("nested_docs").toString
    graft.queries.ParityQueries.nestedDoc(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    // read only station.id out of the 4-struct document
    val q = spark.read.parquet(dir)
      .filter(col("station.id") === "7")
      .select(col("station.id"))
    assert(q.count() > 0)
    val scan = q.queryExecution.executedPlan.toString
    // pruned ReadSchema must not mention the metrics struct at all
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
    assert(readSchema.contains("station"), s"station missing from: $readSchema")
    assert(!readSchema.contains("metrics"), s"metrics not pruned: $readSchema")
  }
}
