package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantics pin for [[DedupQueries.docContainmentPairs]]: a short doc
  * quoted inside a long one is found in exactly ONE direction (quoted →
  * quoter) even though the pair's Jaccard is far below any near-dup
  * threshold — the case the symmetric families cannot represent. */
class ContainmentSpec extends AnyFunSuite with SparkSpec {

  test("strict quote is one-directional; near-identical pairs two-directional") {
    import scala.jdk.CollectionConverters._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val rows = Seq(
      (1L, quote),                       // the quoted short doc
      (2L, s"$filler $quote"),           // the quoting long doc
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")), // unrelated
      (4L, s"${(1 to 40).map(i => s"v$i").mkString(" ")} tail_a"),
      (5L, s"${(1 to 40).map(i => s"v$i").mkString(" ")} tail_b") // near-identical pair
    ).map { case (id, t) => org.apache.spark.sql.Row(id, t) }
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = DedupQueries.docContainmentPairsFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))

    // quote ⊂ quoter: doc 1's 10 shingles all appear in doc 2 → exactly
    // the (1 → 2) direction; doc 2 is NOT contained in doc 1
    assert(got.exists(g => g._1 == 1L && g._2 == 2L && g._3 == 1000000L))
    assert(!got.exists(g => g._1 == 2L && g._2 == 1L))
    // Jaccard of the pair is small: 10 shared / (10 + 70-ish) — the
    // symmetric near-dup pass at τ=0.5 would never emit it
    // near-identical docs 4/5 appear in BOTH directions
    assert(got.exists(g => g._1 == 4L && g._2 == 5L))
    assert(got.exists(g => g._1 == 5L && g._2 == 4L))
    // the unrelated doc appears nowhere
    assert(!got.exists(g => g._1 == 3L || g._2 == 3L))
  }
}
