package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The O(k)-state typed aggregator must agree with the window-ranked
  * formulation (which IS the DuckDB-oracled shape in the query registry). */
class TopKAggregatorSpec extends AnyFunSuite with SparkSpec {

  test("top-3 per group matches window row_number formulation incl. ties") {
    import spark.implicits._
    val rows = Seq(
      ("a", 10.0, 1L), ("a", 30.0, 2L), ("a", 20.0, 3L), ("a", 30.0, 4L), ("a", 5.0, 5L),
      ("b", 1.0, 6L), ("b", 2.0, 7L),
      ("c", 7.0, 8L), ("c", 7.0, 9L), ("c", 7.0, 10L), ("c", 7.0, 11L))
      .toDF("grp", "score", "id")

    // the aggregator consumes (score, id) pairs, so map first
    val typed = rows.as[(String, Double, Long)]
      .map { case (g, s, i) => (g, (s, i)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator(3).toColumn.name("top"))
      .toDF("grp", "top")

    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
    val windowed = rows
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .groupBy($"grp")
      .agg(collect_list(struct($"rk", $"id")).as("pairs"))
      .select($"grp", transform(array_sort($"pairs"), x => x.getField("id")).as("top"))

    val got = typed.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = windowed.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got === want)
    assert(got("a") === Seq(2L, 4L, 3L)) // 30(id2), 30(id4), 20(id3)
    assert(got("b") === Seq(7L, 6L))
    assert(got("c") === Seq(8L, 9L, 10L)) // all-tie: id order
  }
}
