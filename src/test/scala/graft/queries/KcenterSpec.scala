package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[SimilarityQueries.coresetKcenter]]: replay
  * the origin-seeded Gonzalez walk in plain Scala over sf0.001 (exact
  * integer micro-unit distances, min-vec_id tie-break) and compare every
  * pick, then pin the structural properties: the radius sequence is
  * non-increasing (greedy farthest-point guarantees it) and the picks are
  * distinct. */
class KcenterSpec extends AnyFunSuite with SparkSpec {

  private val K = 8

  private def micro(x: Double): Long =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("coreset_kcenter matches a from-scratch Gonzalez replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(v => micro(v.toDouble))))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val zero = Array.fill(vecs.head._2.length)(0L)
    var mind2 = vecs.map { case (id, v) => (id, d2(v, zero)) }.toMap
    val byId = vecs.toMap
    val expected = (1 to K).map { t =>
      val (selId, selD) = mind2.toSeq.maxBy { case (id, d) => (d, -id) }
      mind2 = mind2.map { case (id, d) => id -> math.min(d, d2(byId(id), byId(selId))) }
      (t, selId, selD)
    }
    val got = SimilarityQueries.coresetKcenter(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
  }

  test("radius sequence is non-increasing and picks are distinct") {
    val got = SimilarityQueries.coresetKcenter(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).distinct.length === got.length)
    // greedy farthest-point: pick t's radius is the max min-distance at
    // step t, which pick t+1 can only have reduced or matched
    got.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"radius grew: $a -> $b")
      case _ =>
    }
  }
}
