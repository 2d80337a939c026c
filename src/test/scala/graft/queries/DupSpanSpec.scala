package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[DedupQueries.docDupSpans]]: recompute the
  * duplicated-span profile in plain Scala over sf0.001 — tokenize, build
  * every 8-token window, count windows corpus-wide BY TEXT (no hashing:
  * if the query's 60-bit hash path disagreed with exact gram identity,
  * this catches the collision/`concat_ws` drift the DuckDB oracle cannot,
  * since the oracle shares the hash), mark repeated-window starts, merge
  * starts ≤ K apart into islands, and compare every output row. */
class DupSpanSpec extends AnyFunSuite with SparkSpec {

  private val K = 8
  // the SAME 6-char whitespace set as TextFunctions.tokens / the oracle
  // CTEs (NOT String.trim, which strips every char <= U+0020)
  private val Ws = " \t\n\r\u000B\f"

  private def toks(text: String): Array[String] = {
    val t = text.replaceAll(s"^[$Ws]+|[$Ws]+$$", "")
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  test("doc_dup_spans matches a from-scratch recompute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    // corpus-wide 8-gram occurrence counts, by exact gram text
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val docGrams = docs.map { case (id, text) =>
      val t = toks(text)
      val grams = (0 to t.length - K).map(p => (p, t.slice(p, p + K).mkString(" ")))
      grams.foreach { case (_, g) => counts(g) = counts.getOrElse(g, 0) + 1 }
      (id, t.length, grams)
    }

    val expected = docGrams.map { case (id, nTok, grams) =>
      val dupStarts = grams.collect { case (p, g) if counts(g) >= 2 => p }
      // islands: a start within K of the previous start extends the span
      var spans = List.empty[(Int, Int)] // (first, last) start positions
      dupStarts.foreach { p =>
        spans match {
          case (f, l) :: rest if p - l <= K => spans = (f, p) :: rest
          case _ => spans = (p, p) :: spans
        }
      }
      val dupTokens = spans.map { case (f, l) => l - f + K }.sum
      val frac = if (nTok > 0) dupTokens.toLong * 1000000L / nTok else 0L
      (id, nTok.toLong, spans.size.toLong, dupTokens.toLong, frac)
    }

    val got = DedupQueries.docDupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e, s"doc ${e._1}") }
    // the fixture must actually exercise the operator: some duplication,
    // but not everything duplicated
    assert(expected.exists(_._4 > 0), "corpus has no duplicated spans — vacuous test")
    assert(expected.exists(_._4 == 0), "every doc fully duplicated — suspicious fixture")
  }

  test("boundary cases: short docs, exact duplicates, unique docs") {
    import scala.jdk.CollectionConverters._
    val twelve = (1 to 12).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, "a b c"),                                   // < K tokens: no window at all
      (2L, twelve), (3L, twelve),                      // exact dups: fully covered
      (4L, (1 to 20).map(i => s"uniq$i").mkString(" ")) // unique: zero coverage
    ).map { case (id, t) => org.apache.spark.sql.Row(id, t) }
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = DedupQueries.docDupSpansFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 12L, 1L, 12L, 1000000L),
      (3L, 12L, 1L, 12L, 1000000L),
      (4L, 20L, 0L, 0L, 0L)))
  }
}
