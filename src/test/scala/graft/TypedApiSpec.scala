package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §1.3: `Dataset[T]` with case-class Encoders at API boundaries.
  * The typed path (groupByKey/mapGroups — arbitrary JVM logic per group)
  * must agree with the relational groupBy it generalizes. The relational
  * form stays the default (codegen + partial aggregation); the typed form
  * is the escape hatch for logic Catalyst can't express, and this spec
  * pins the equivalence contract between them. */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

class TypedApiSpec extends AnyFunSuite with SparkSpec {

  test("typed groupByKey/mapGroups agrees with relational groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ds = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_totalprice").as[OrderRow]

    val typed = ds.groupByKey(_.o_custkey)
      .mapGroups { (k, it) =>
        val rows = it.toSeq
        (k, rows.size.toLong, rows.map(_.o_orderkey).sum)
      }
      .toDF("custkey", "n", "keysum")

    val relational = ds.toDF()
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("keysum"))

    assert(typed.count() === relational.count())
    assert(typed.except(relational).isEmpty && relational.except(typed).isEmpty)
  }

  test("typed filter/map preserves Encoder schema end-to-end") {
    import spark.implicits._
    val ds = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_totalprice").as[OrderRow]
    val big = ds.filter(_.o_totalprice > 100000.0)
      .map(o => o.copy(o_totalprice = o.o_totalprice / 1000.0))
    assert(big.schema.fieldNames.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
    assert(big.count() > 0)
    assert(big.collect().forall(_.o_totalprice <= 1000.0))
  }
}
