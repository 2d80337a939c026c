package graft.queries

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the rank-statistics drift operators:
  * Mann–Whitney U re-derived by BRUTE-FORCE pairwise comparison of the raw
  * lengths (the definition the histogram formulation must reproduce), and
  * Spearman re-derived from scratch average-rank assignment — both checked
  * against the registered queries on the real sf0.001 corpus. */
class RankStatsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lengthsBySource(): Map[String, Seq[Long]] = {
    Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.toSeq.map(_.getAs[Long]("n_chars"))).toMap
  }

  test("source_length_mwu: 2U equals the brute-force pairwise definition") {
    val bySource = lengthsBySource()
    val rows = PipelineQueries.sourceLengthMwu(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = bySource(r.getAs[String]("source_a"))
      val b = bySource(r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_a") === a.size.toLong)
      assert(r.getAs[Long]("n_b") === b.size.toLong)
      // 2U = Σ_{x∈a, y∈b} (2·[x>y] + [x=y]) — the definition, O(n_a·n_b)
      val u2ref = (for (x <- a; y <- b)
        yield (if (x > y) 2L else 0L) + (if (x == y) 1L else 0L)).sum
      // u2 ACCUMULATES in DECIMAL(38,0) (the >2⁶² envelope fix) but
      // emits BIGINT since r7 (DECIMAL output ban)
      assert(r.getAs[Long]("u2") === u2ref,
        s"${r.getAs[String]("source_a")} vs ${r.getAs[String]("source_b")}")
      // AUC is 2U normalized into [0,1]
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
      assert(math.abs(auc - u2ref.toDouble / (2.0 * a.size * b.size)) < 2e-6)
    }
  }

  test("source_length_mwu: z matches the tie-corrected normal approximation") {
    val bySource = lengthsBySource()
    val rows = PipelineQueries.sourceLengthMwu(spark, dir).collect()
    rows.foreach { r =>
      val a = bySource(r.getAs[String]("source_a"))
      val b = bySource(r.getAs[String]("source_b"))
      val na = a.size.toDouble; val nb = b.size.toDouble; val n = na + nb
      val ties = (a ++ b).groupBy(identity).values
        .map(g => { val t = g.size.toDouble; t * t * t - t }).sum
      val aTerm = n * n * n - n - ties
      val u = (for (x <- a; y <- b)
        yield (if (x > y) 1.0 else 0.0) + (if (x == y) 0.5 else 0.0)).sum
      if (aTerm == 0) assert(r.isNullAt(r.fieldIndex("z")))
      else {
        val z = (u - na * nb / 2) / math.sqrt(na * nb * aTerm / (12 * n * (n - 1)))
        assert(math.abs(r.getAs[Double]("z") - z) < 2e-6,
          s"${r.getAs[String]("source_a")} vs ${r.getAs[String]("source_b")}")
      }
    }
  }

  test("source_rank_spearman matches scratch average-rank Pearson") {
    val docs = Tables.documents(spark, dir)
      .select("source", "n_chars", "text").collect()
      .groupBy(_.getAs[String]("source"))
    val rows = PipelineQueries.sourceRankSpearman(spark, dir).collect()
    assert(rows.nonEmpty)

    def avgRanks(xs: Seq[Long]): Seq[Double] = {
      // average 1-based rank of each element under ties
      val sorted = xs.sorted
      val firstIdx = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1 + g.map(_._2).max + 1) / 2.0).toMap
      xs.map(firstIdx)
    }
    def pearson(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size.toDouble
      val sx = x.sum; val sy = y.sum
      val num = n * x.zip(y).map { case (a, b) => a * b }.sum - sx * sy
      val d1 = n * x.map(a => a * a).sum - sx * sx
      val d2 = n * y.map(a => a * a).sum - sy * sy
      num / math.sqrt(d1 * d2)
    }

    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = docs(src)
      val v = ds.map(_.getAs[Long]("n_chars")).toSeq
      // trim with the query's explicit 6-char whitespace set — Java
      // String.trim strips ALL chars ≤ U+0020, which would diverge from
      // the query on docs with other leading/trailing control characters
      val Ws = " \t\n\r\u000B\f"
      val w = ds.map { d =>
        val t = Option(d.getAs[String]("text")).getOrElse("")
          .dropWhile(Ws.contains(_)).reverse.dropWhile(Ws.contains(_)).reverse
        if (t.isEmpty) 0L else t.split("\\s+").length.toLong
      }.toSeq
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      val rho = pearson(avgRanks(v), avgRanks(w))
      assert(math.abs(r.getAs[Double]("spearman_rho") - rho) < 2e-6, src)
      val rp = pearson(v.map(_.toDouble), w.map(_.toDouble))
      assert(math.abs(r.getAs[Double]("pearson_r") - rp) < 2e-6, src)
      // chars vs tokens must correlate strongly positively on real text
      assert(rho > 0.5, s"$src: implausible rank correlation $rho")
    }
  }

  // The control-character fixture behind the recount's explicit 6-char
  // whitespace set (and the query's trim contract): the token boundary
  // is EXACTLY Java-regex \s = { space, \t, \n, \u000B, \f, \r } — both
  // dialects trim/split on that set and nothing else. Java String.trim
  // instead strips EVERY char ≤ U+0020, so a document whose text is a
  // bare control character (U+0001 here) is where the two definitions
  // visibly part: the contract counts one token, String.trim counts
  // zero. A recount written with .trim would pass on clean corpora and
  // silently diverge on real-world dirty text — this pins the contract
  // so it cannot.
  test("token boundary is the 6-char \\s set, not String.trim's ≤U+0020") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val rows = Seq(
      "\u0001" -> 1L, // control char IS a token; String.trim would say 0
      " \n\tabc \u000B" -> 1L, // all six ws chars strip/split
      "a\u0001b" -> 1L, // \u0001 does not split a token
      " \t\n\u000B\f\r" -> 0L, // pure 6-set whitespace → empty
      "" -> 0L)
    val got = rows.map(_._1).toDF("text")
      .select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === rows.map(_._2))
    // and the divergence is REAL: a String.trim recount disagrees on the
    // control-char rows — the exact bug the 6-char set in this spec's
    // Spearman recount guards against
    def trimRecount(s: String): Long = {
      val t = s.trim
      if (t.isEmpty) 0L else t.split("\\s+").length.toLong
    }
    assert(trimRecount("\u0001") === 0L)
    assert(trimRecount("\u0001") !== rows.head._2)
  }
}
