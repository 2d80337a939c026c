package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The injected optimizer rule rewrites pow(x, 2) to x*x and leaves
  * every other exponent to Math.pow. */
class StrengthReductionSpec extends AnyFunSuite with SparkSpec {

  test("pow(x, 2) is strength-reduced; pow(x, 3) is not") {
    val df = spark.range(5).select(col("id").cast("double").as("x"))
    val squared = df.select(pow(col("x"), 2.0).as("y"))
    val opt = squared.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("pow"), s"POWER survived:\n$opt")
    assert(squared.collect().map(_.getDouble(0)).toSeq ===
      Seq(0.0, 1.0, 4.0, 9.0, 16.0))

    val cubed = df.select(pow(col("x"), 3.0).as("y"))
    assert(cubed.queryExecution.optimizedPlan.toString.toLowerCase.contains("pow"),
      "pow(x,3) must be left alone")
    assert(cubed.collect().map(_.getDouble(0)).toSeq ===
      Seq(0.0, 1.0, 8.0, 27.0, 64.0))
  }
}
