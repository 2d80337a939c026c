package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[PipelineQueries.corpusInterleave]]:
  * replay the seeded-hash stratified round-robin in plain Scala (md5
  * rank within source, source index by name order, key arithmetic) and
  * compare; then pin the property the operator exists for — the first
  * |S| keys hit |S| DISTINCT sources. */
class InterleaveSpec extends AnyFunSuite with SparkSpec {

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("corpus_interleave matches a from-scratch replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sources = docs.map(_._2).distinct.sorted
    val idx0 = sources.zipWithIndex.toMap
    val nsrc = sources.length.toLong
    val expected = docs.toSeq
      .map { case (id, src) => (id, src, h60(s"il42:$id")) }
      .groupBy(_._2)
      .flatMap { case (src, rows) =>
        rows.sortBy { case (id, _, h) => (h, id) }.zipWithIndex.map {
          case ((id, _, _), i) =>
            val rank = i + 1L
            (id, src, rank, (rank - 1) * nsrc + idx0(src))
        }
      }
      .toSeq.sortBy(_._4)
    val got = PipelineQueries.corpusInterleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("the first |S| positions cover |S| distinct sources") {
    val got = PipelineQueries.corpusInterleave(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1))
    val nsrc = got.distinct.length
    assert(got.take(nsrc).distinct.length === nsrc,
      "round-robin prefix repeats a source before covering all of them")
  }
}
