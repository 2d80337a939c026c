package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles oracle for [[CorpusQueries.bpeApply]] (and, in
  * passing, the rule list of bpe_merges_k): an independent plain-Scala
  * BPE — symbol LISTS and a recursive left-to-right merge, not the
  * string-accumulator fold both the query and the DuckDB mirror share —
  * trained and applied at sf0.001, compared row-for-row. A bug in the
  * shared fold (delimiter collision, overlap handling) shows up here and
  * nowhere else. */
class BpeApplySpec extends AnyFunSuite with SparkSpec {

  private val Rounds = 10
  private val Ws = " \t\n\r\f"

  private def toks(text: String): Array[String] = {
    val t = text.replaceAll(s"^[$Ws]+|[$Ws]+$$", "")
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Greedy left-to-right non-overlapping single-rule merge: after a
    * merge the scan resumes AFTER the consumed pair ('aaaa' + (a,a) →
    * [aa, aa], never [aa, a, a] or re-merged [aaaa]). */
  private def applyMerge(sym: List[String], pa: String, pb: String): List[String] =
    sym match {
      case a :: b :: rest if a == pa && b == pb => (pa + pb) :: applyMerge(rest, pa, pb)
      case a :: rest => a :: applyMerge(rest, pa, pb)
      case Nil => Nil
    }

  test("bpe_apply matches an independent Scala BPE at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val srcCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.foreach { case (src, text) =>
      toks(text).filter(_.matches("^[a-z]+$")).foreach { w =>
        srcCnt((src, w)) = srcCnt.getOrElse((src, w), 0L) + 1L
      }
    }
    val freq: Map[String, Long] =
      srcCnt.groupBy(_._1._2).map { case (w, m) => (w, m.values.sum) }

    // train: 10 rounds of (count pairs over current segmentation, merge)
    var state: Map[String, List[String]] =
      freq.keys.map(w => (w, w.toList.map(_.toString))).toMap
    val rules = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    (1 to Rounds).foreach { _ =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (w, sym) =>
        sym.zip(sym.tail).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + freq(w)
        }
      }
      val ((pa, pb), n) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      rules += ((pa, pb, n))
      state = state.map { case (w, sym) => (w, applyMerge(sym, pa, pb)) }
    }

    // the learned rules must equal bpe_merges_k's output
    val gotRules = CorpusQueries.bpeMergesK(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(gotRules.toSeq === rules.toSeq, "merge-rule list diverged")

    // apply: per-source fertility report
    val expected = srcCnt.groupBy(_._1._1).map { case (src, m) =>
      val alpha = m.values.sum
      val distinct = m.size.toLong
      val bpe = m.map { case ((_, w), c) => c * state(w).length }.sum
      (src, alpha, distinct, bpe, Math.floorDiv(bpe * 1000000L, alpha))
    }.toSeq.sortBy(_._1)

    val got = CorpusQueries.bpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected)
    // the tokenizer must actually compress: fewer BPE tokens than chars,
    // more than words (fertility strictly > 1 somewhere)
    assert(expected.exists(e => e._4 > e._2), "fertility ≤ 1 everywhere — vacuous")
  }
}
