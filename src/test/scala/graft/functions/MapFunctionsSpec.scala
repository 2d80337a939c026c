package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Map-typed column family (the harness testdata carries no map columns,
  * and registered queries avoid map OUTPUT — the driver compare can't
  * hash dicts — so the family is pinned here): construction, lambda
  * transforms, filtering, merge, zip. */
class MapFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("map construction, transform_values, map_filter, map_concat, map_zip_with") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b", "a", "c"))).toDF("id", "toks")
      // token -> count map built from arrays (the vocabulary-as-map shape)
      .withColumn("counts",
        map_from_arrays(
          array_distinct(col("toks")),
          transform(array_distinct(col("toks")),
            t => size(filter(col("toks"), x => x === t)))))

    val m = df.select(col("counts")).head().getMap[String, Int](0)
    assert(m === Map("a" -> 2, "b" -> 1, "c" -> 1))

    val scaled = df.select(
      transform_values(col("counts"), (_, v) => v * 10).as("m"))
      .head().getMap[String, Int](0)
    assert(scaled === Map("a" -> 20, "b" -> 10, "c" -> 10))

    val frequent = df.select(
      map_filter(col("counts"), (_, v) => v > 1).as("m"))
      .head().getMap[String, Int](0)
    assert(frequent === Map("a" -> 2))

    val merged = df.select(
      map_concat(col("counts"), map(lit("d"), lit(7))).as("m"))
      .head().getMap[String, Int](0)
    assert(merged === Map("a" -> 2, "b" -> 1, "c" -> 1, "d" -> 7))

    val zipped = df.select(
      map_zip_with(col("counts"), col("counts"), (_, v1, v2) => v1 + v2).as("m"))
      .head().getMap[String, Int](0)
    assert(zipped === Map("a" -> 4, "b" -> 2, "c" -> 2))

    assert(df.select(element_at(col("counts"), "a")).head().getInt(0) === 2)
    assert(df.select(map_keys(col("counts"))).head().getSeq[String](0).sorted
      === Seq("a", "b", "c"))
  }
}
