package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-7 lexical tier: Kneser–Ney
  * bigrams, Church–Gale burstiness, Flesch readability, lexical
  * diversity, and the Heaps'-law fit — all re-derived from the raw
  * documents table with independent Scala code at sf0.001. */
class LexicalTierSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def toks(text: String): Vector[String] = {
    val Ws = " \t\n\r\f"
    val t = Option(text).getOrElse("")
      .dropWhile(Ws.contains(_)).reverse.dropWhile(Ws.contains(_)).reverse
    if (t.isEmpty) Vector.empty else t.split("\\s+").toVector
  }

  private lazy val docs: Vector[(Long, String)] =
    Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toVector

  test("bigram_kneser_ney: probabilities match an independent KN recount") {
    val bigrams = docs.flatMap { case (_, t) =>
      val w = toks(t); w.zip(w.drop(1))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1f = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1r = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = c12.size.toLong
    val rows = TextQueries.bigramKneserNey(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val key = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") === c12(key))
      assert(r.getAs[Long]("c1") === c1(key._1))
      assert(r.getAs[Long]("n1f") === n1f(key._1))
      assert(r.getAs[Long]("n1r") === n1r(key._2))
      val p = math.floor(((c12(key) - 0.75) / c1(key._1)
        + 0.75 * n1f(key._1) / c1(key._1) * (n1r(key._2).toDouble / types))
        * 1e6) / 1e6
      assert(r.getAs[Double]("p_kn") === p, s"p_kn mismatch for $key")
      // interpolated KN with c12 >= 5 must stay a probability
      assert(p > 0.0 && p <= 1.0)
    }
  }

  test("token_burstiness: cf/df and ratios match a direct recount") {
    val perDoc = docs.flatMap { case (id, t) => toks(t).map(tok => (tok, id)) }
    val cf = perDoc.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val df = perDoc.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = TextQueries.tokenBurstiness(spark, dir).collect()
    assert(rows.length === 20)
    val expectedTop = cf.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(rows.map(_.getAs[String]("token")).toSeq === expectedTop.map(_._1))
    rows.foreach { r =>
      val t = r.getAs[String]("token")
      assert(r.getAs[Long]("cf") === cf(t))
      assert(r.getAs[Long]("df") === df(t))
      assert(r.getAs[Long]("burst_ppm") === cf(t) * 1000000L / df(t))
      assert(r.getAs[Long]("doc_rate_ppm") === df(t) * 1000000L / docs.size)
    }
  }

  test("doc_readability: Flesch pieces match a regex recount on every doc") {
    val rows = TextQueries.docReadability(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    var checked = 0
    docs.foreach { case (id, t) =>
      val words = toks(t).size.toLong
      if (words > 0) {
        val sents = math.max(1L, "[.!?]+".r.findAllIn(t).size.toLong)
        val sylls = "[aeiouy]+".r.findAllIn(t.toLowerCase).size.toLong
        val r = rows(id)
        assert(r.getAs[Long]("n_words") === words)
        assert(r.getAs[Long]("n_sents") === sents)
        assert(r.getAs[Long]("n_sylls") === sylls)
        val f = math.floor((206.835 - 1.015 * (words.toDouble / sents)
          - 84.6 * (sylls.toDouble / words)) * 1e6) / 1e6
        assert(r.getAs[Double]("flesch") === f, s"flesch mismatch doc $id")
        checked += 1
      } else assert(!rows.contains(id), s"zero-word doc $id must be excluded")
    }
    assert(checked > 100)
  }

  test("doc_lexical_diversity: TTR/hapax/Herdan match per-doc recounts") {
    val rows = TextQueries.docLexicalDiversity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.filter(d => toks(d._2).nonEmpty).foreach { case (id, t) =>
      val w = toks(t)
      val counts = w.groupBy(identity).view.mapValues(_.size).toMap
      val (nTok, nTyp) = (w.size.toLong, counts.size.toLong)
      val hapax = counts.valuesIterator.count(_ == 1).toLong
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") === nTok)
      assert(r.getAs[Long]("n_types") === nTyp)
      assert(r.getAs[Long]("n_hapax") === hapax)
      assert(r.getAs[Long]("ttr_ppm") === nTyp * 1000000L / nTok)
      assert(r.getAs[Long]("hapax_ppm") === hapax * 1000000L / nTyp)
      if (nTok > 1) {
        val c = math.floor(
          (math.rint(math.log(nTyp.toDouble) * 1e6) / 1e6)
            / (math.rint(math.log(nTok.toDouble) * 1e6) / 1e6) * 1e6) / 1e6
        // rint (half-even) vs the query's HALF_UP rounding of the 6-dp ln
        // can only differ on an exact half — compare with a 2-ulp(6dp) band
        assert(math.abs(r.getAs[Double]("herdan_c") - c) < 2e-6,
          s"herdan mismatch doc $id")
      }
    }
  }

  test("heaps_law_fit: checkpoints and OLS match an independent replay") {
    val maxId = docs.map(_._1).max
    def decile(id: Long): Long = math.min(9L, id * 10 / (maxId + 1))
    val perDecTokens = docs.groupBy(d => decile(d._1))
      .view.mapValues(_.map(d => toks(d._2).size.toLong).sum).toMap
    val firstDoc = docs.flatMap { case (id, t) => toks(t).map(w => (w, id)) }
      .groupBy(_._1).view.mapValues(v => decile(v.map(_._2).min)).toMap
    val perDecTypes = firstDoc.values.toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val deciles = (perDecTokens.keySet ++ perDecTypes.keySet).toSeq.sorted
    val pts = deciles.scanLeft((0L, 0L)) { case ((n, v), d) =>
      (n + perDecTokens.getOrElse(d, 0L), v + perDecTypes.getOrElse(d, 0L))
    }.drop(1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val xs = pts.map(p => r6(math.log(p._1.toDouble)))
    val ys = pts.map(p => r6(math.log(p._2.toDouble)))
    val (sx, sy) = (xs.sum, ys.sum) // exact: 6-dp values, 10 terms
    val sxy = xs.zip(ys).map { case (a, b) => r9(a * b) }.sum
    val sxx = xs.map(a => r9(a * a)).sum
    val n = pts.size
    val beta = math.floor((n * sxy - sx * sy) * 1e6
      / (n * sxx - sx * sx)) / 1e6
    val r = CorpusQueries.heapsLawFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_checkpoints") === n.toLong)
    assert(r.getAs[Long]("total_tokens") === pts.last._1)
    assert(r.getAs[Long]("total_vocab") === pts.last._2)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 2e-6)
    // this synthetic corpus has a CLOSED vocabulary (every type appears
    // in decile 0), so the diagnostic must report beta ≈ 0 — the exact
    // "crawl is re-reading itself" signal it exists to raise
    assert(beta > -0.01 && beta < 0.05)
    assert(r.getAs[Long]("total_vocab") < r.getAs[Long]("total_tokens") / 100)
  }
}
