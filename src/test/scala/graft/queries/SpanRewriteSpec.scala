package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[DedupQueries.dedupSpanRewrite]]: recompute
  * the ExactSubstr deletion in plain Scala over sf0.001 BY EXACT GRAM TEXT
  * (no hashing — catches any 60-bit-hash/`concat_ws` drift the DuckDB
  * oracle shares with the query and therefore cannot see), and pin the
  * keep-first / delete-rest semantics on hand-built boundary fixtures. */
class SpanRewriteSpec extends AnyFunSuite with SparkSpec {

  private val K = 8
  private val Ws = " \t\n\r\f"

  private def toks(text: String): Array[String] = {
    val t = text.replaceAll(s"^[$Ws]+|[$Ws]+$$", "")
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  test("dedup_span_rewrite matches a from-scratch recompute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    // corpus-wide first occurrence of each 8-gram, by exact gram text,
    // in (doc_id, pos) lexicographic order (docs are sorted by id)
    val firstOcc = scala.collection.mutable.Map.empty[String, (Long, Int)]
    val count = scala.collection.mutable.Map.empty[String, Int]
    val docGrams = docs.map { case (id, text) =>
      val t = toks(text)
      val grams = (0 to t.length - K).map(p => (p, t.slice(p, p + K).mkString(" ")))
      grams.foreach { case (p, g) =>
        count(g) = count.getOrElse(g, 0) + 1
        if (!firstOcc.contains(g)) firstOcc(g) = (id, p)
      }
      (id, t, grams)
    }

    val expected = docGrams.map { case (id, t, grams) =>
      val dupStarts = grams.collect {
        case (p, g) if count(g) >= 2 && firstOcc(g) != ((id, p)) => p
      }.toSet
      val covered = (0 until t.length).map(p =>
        dupStarts.exists(s => s <= p && p < s + K))
      val keptToks = t.indices.filter(!covered(_)).map(t)
      (id, t.length.toLong, keptToks.length.toLong,
        (t.length - keptToks.length).toLong, keptToks.mkString(" "))
    }

    val got = DedupQueries.dedupSpanRewrite(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e, s"doc ${e._1}") }
    // non-vacuous: something deleted, and at least one first copy survives
    // inside a doc that also lost tokens elsewhere or fully-kept docs exist
    assert(expected.exists(_._4 > 0), "no spans deleted — vacuous fixture")
    assert(expected.exists(e => e._4 == 0 && e._2 > 0), "every doc lost tokens")
  }

  test("keep-first semantics on boundary fixtures") {
    import scala.jdk.CollectionConverters._
    val eight = (1 to 8).map(i => s"a$i").mkString(" ")
    val b8 = (1 to 8).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, "x y z"),                     // < K tokens: passes through verbatim
      (2L, eight),                       // corpus-first copy: survives intact
      (3L, eight),                       // later copy: fully deleted
      (4L, s"$eight mid $eight"),        // both windows dup vs doc 2: only mid left
      (5L, (1 to 9).map(i => s"u$i").mkString(" ")), // unique: untouched
      (6L, s"$b8 mid2 $b8")              // pure self-repeat: first window kept
    ).map { case (id, t) => org.apache.spark.sql.Row(id, t) }
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = DedupQueries.dedupSpanRewriteFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 3L, 3L, 0L, "x y z"),
      (2L, 8L, 8L, 0L, eight),
      (3L, 8L, 0L, 8L, ""),
      (4L, 17L, 1L, 16L, "mid"),
      (5L, 9L, 9L, 0L, (1 to 9).map(i => s"u$i").mkString(" ")),
      (6L, 17L, 9L, 8L, s"$b8 mid2")))
  }
}
