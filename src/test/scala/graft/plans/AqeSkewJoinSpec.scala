package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** AQE skew-join handling — the RUNTIME leg of the skew story (the
  * static leg is `SaltedJoin` + `salted_brand_revenue`): a join with one
  * hot key must have its oversized shuffle partition SPLIT by
  * OptimizeSkewedJoin instead of serializing one straggler task. This is
  * the mechanism the engine leans on at 100 TB when skew is not known in
  * advance (salting covers the keys you know about; AQE covers the ones
  * you discover at runtime). */
class AqeSkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("OptimizeSkewedJoin splits the hot key's partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // thresholds lowered so the test-scale hot key counts as skewed
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep the join a real shuffle join — broadcast would dodge skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows on ONE hot key + a uniform tail; right: payloads
      // per key — the classic one-straggler shape. NB: the query must not
      // re-aggregate ON the join key downstream: a required hash
      // distribution on k makes OptimizeSkewedJoin decline the split
      // (it would have to re-shuffle what it just split).
      val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(0, 20000).select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val right = spark.range(0, 101).select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k").select(sum(col("v") + col("w")).as("s"))
      val got = joined.collect().head.getAs[Long]("s") // AQE decides during execution
      // reference: same join forced through broadcast (no skew machinery)
      val expected = left.join(broadcast(right), "k")
        .select(sum(col("v") + col("w")).as("s")).collect().head.getAs[Long]("s")
      assert(got === expected, "skew-split join must not change the result")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split marker in final plan:\n${finalPlan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
