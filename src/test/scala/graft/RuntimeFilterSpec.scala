package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection — DPP's cousin for non-partitioned
  * join keys: a selective filter on the dimension side materializes a
  * bloom filter that prunes the fact scan's rows before the shuffle.
  * At 100 TB this is the difference between shuffling the fact table
  * and shuffling the ~matching slice. Thresholds are lowered here
  * because the feature gates on production-scale sizes. */
class RuntimeFilterSpec extends AnyFunSuite with SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val li = graft.sources.Tables.lineitem(spark, dir)
      val o = graft.sources.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("bloom"), s"no bloom filter injected:\n${opt.take(1500)}")
      assert(q.head().getLong(0) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
