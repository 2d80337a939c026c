package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[SimilarityQueries.knnMmrRerank]]: replay
  * the greedy MMR walk in plain Scala over sf0.001 — cosine in a
  * left-to-right double fold (the engines' summation order), micro-unit
  * rounding via HALF_UP BigDecimal (Spark's round()), integer greedy
  * argmax with vec_id tie-break — and compare every selected row. Also
  * pins the property the operator exists for: the MMR set diverges from
  * plain top-k when the top of the ranking is redundant. */
class MmrRerankSpec extends AnyFunSuite with SparkSpec {

  private val Cand = 20
  private val K = 5

  private def micro(x: Double): Long =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("knn_mmr_rerank matches a from-scratch greedy replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val norm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vecs = emb.toMap
    def simMicro(a: Long, b: Long): Long =
      micro(dot(vecs(a), vecs(b)) / (norm(a) * norm(b)))

    val expected = emb.map(_._1).filter(_ < 10).flatMap { qId =>
      val cand = emb.map(_._1).filter(_ != qId)
        .map(v => (v, simMicro(qId, v)))
        .sortBy { case (v, rel) => (-rel, v) }
        .take(Cand)
      var selected = Vector.empty[(Long, Long, Long, Long)] // (vec, rel, maxsim, score2x)
      (1 to K).foreach { _ =>
        val pick =
          if (selected.isEmpty) {
            val (v, rel) = cand.head
            (v, rel, 0L, rel)
          } else {
            cand.filterNot { case (v, _) => selected.exists(_._1 == v) }
              .map { case (v, rel) =>
                val ms = selected.map(s => simMicro(v, s._1)).max
                (v, rel, ms, rel - ms)
              }
              .minBy { case (v, _, _, sc) => (-sc, v) }
          }
        selected :+= pick
      }
      selected.zipWithIndex.map { case ((v, rel, ms, sc), i) =>
        (qId, i + 1, v, rel, ms, sc)
      }
    }

    val got = SimilarityQueries.knnMmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // result columns: q_id, vec_id, step, rel, maxsim, score2x — reorder
    // to (q_id, step, vec_id, ...) for the compare
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e, s"q ${e._1} step ${e._2}") }
  }

  test("MMR diverges from plain top-k somewhere in the corpus") {
    val dir = "/root/testdata/sf0.001"
    val mmr = SimilarityQueries.knnMmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val topk = SimilarityQueries.knnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(mmr != topk,
      "MMR selected exactly the plain top-5 for every query — the rerank " +
        "is vacuous on this corpus (diversity term never bound)")
  }
}
