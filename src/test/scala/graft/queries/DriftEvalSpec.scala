package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles checks for source_js_divergence and
  * classifier_pr_curve: JS recomputed from raw token counts with plain
  * Scala doubles (tolerance-compared — the query's 6-decimal ln rounding
  * and fixed-point floor bound the gap), plus the PR curve's exact
  * monotonicity and bin identities. */
class DriftEvalSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Ws = " \t\n\r\f"

  private def toks(text: String): Array[String] = {
    val t = text.replaceAll(s"^[$Ws]+|[$Ws]+$$", "")
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  test("source_js_divergence tracks a plain-double JS recompute") {
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.foreach { case (s, t) =>
      toks(t).foreach(w => cnt((s, w)) = cnt.getOrElse((s, w), 0L) + 1L) }
    val bySrc = cnt.toSeq.groupBy(_._1._1)
      .map { case (s, xs) => (s, xs.map { case ((_, w), c) => (w, c) }.toMap) }
    val tot = bySrc.map { case (s, m) => (s, m.values.sum) }

    val got = PipelineQueries.sourceJsDivergence(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val srcs = bySrc.keys.toSeq.sorted
    assert(got.size === srcs.size * (srcs.size - 1) / 2)
    for (i <- srcs.indices; j <- (i + 1) until srcs.size) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (ma, mb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (tot(sa).toDouble, tot(sb).toDouble)
      val vocab = ma.keySet ++ mb.keySet
      var js = 0.0
      vocab.foreach { w =>
        val p = ma.getOrElse(w, 0L) / na
        val q = mb.getOrElse(w, 0L) / nb
        val m = (p + q) / 2
        if (p > 0) js += 0.5 * p * math.log(p / m)
        if (q > 0) js += 0.5 * q * math.log(q / m)
      }
      val (gNa, gNb, shared, jsMicro) = got((sa, sb))
      assert(gNa === tot(sa) && gNb === tot(sb))
      assert(shared === (ma.keySet & mb.keySet).size.toLong)
      assert(jsMicro >= 0 && jsMicro <= 693148, s"JS out of [0, ln2] for ($sa,$sb)")
      // 6-decimal ln rounding: each of ≤2·|vocab| terms can move by 5e-7
      val tol = 1e-6 * vocab.size + 2e-6
      assert(math.abs(jsMicro / 1e6 - js) <= tol,
        s"($sa,$sb): got ${jsMicro / 1e6}, recomputed $js")
    }
    assert(got.values.exists(_._4 > 0), "all JS zero — vacuous fixture")
  }

  test("embedding_centroid_drift matches a plain-Scala recompute") {
    val rows = graft.sources.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint)) as m")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))

    val byLabel = rows.groupBy(_._2)
    val expected = byLabel.flatMap { case (lbl, vs) =>
      val ev = vs.filter(_._1 % 2 == 0).map(_._3)
      val od = vs.filter(_._1 % 2 != 0).map(_._3)
      if (ev.isEmpty || od.isEmpty) None
      else {
        val d = ev.head.length
        val sa = (0 until d).map(i => ev.map(_(i)).sum).toArray
        val sb = (0 until d).map(i => od.map(_(i)).sum).toArray
        val dot = (0 until d).map(i => BigInt(sa(i)) * sb(i)).sum
        val naa = (0 until d).map(i => BigInt(sa(i)) * sa(i)).sum
        val nbb = (0 until d).map(i => BigInt(sb(i)) * sb(i)).sum
        val cos = dot.toDouble / math.sqrt(naa.toDouble * nbb.toDouble)
        Some((lbl, ev.length.toLong, od.length.toLong,
          math.floor(cos * 1e6).toLong))
      }
    }.toSeq.sortBy(_._1)

    val got = SimilarityQueries.embeddingCentroidDrift(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // cosine stays in [-1, 1] and must not be degenerate (saturated at
    // exactly 10^6 everywhere); near-random sf0.001 embeddings can land
    // individual labels anywhere in the range, including below zero
    assert(got.forall(g => g._4 >= -1000000L && g._4 <= 1000000L))
    assert(got.exists(g => g._4 < 1000000L), "cosine saturated — vacuous")
  }

  test("classifier_pr_curve is monotone and self-consistent") {
    val rows = TextQueries.classifierPrCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq === (1 to 9).map(_ * 100000L))
    val nPos = rows.head._3
    rows.foreach { r =>
      assert(r._3 === nPos, "n_pos must be threshold-independent")
      assert(r._4 <= math.min(r._2, r._3), "tp bounded by pred_pos and pos")
      assert(r._5 <= 1000000L && r._6 <= 1000000L && r._7 <= 1000000L)
      // dice identity: f1 = 2tp/(pred+pos) with integer floor
      val f1 = if (r._2 + r._3 > 0) Math.floorDiv(2 * r._4 * 1000000L, r._2 + r._3) else 0L
      assert(r._7 === f1)
    }
    // raising the threshold can only shrink predicted positives and tp
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._4 <= a._4)
    }
    assert(rows.head._2 > rows.last._2, "threshold sweep is flat — vacuous")
  }
}
