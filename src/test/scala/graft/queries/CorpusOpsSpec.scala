package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Invariant checks for the corpus/retrieval/packing tier and the binned
  * range join — properties the value-hash oracle can't express (mass
  * conservation, monotonicity, plan shape). */
class CorpusOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("doc_pack_bins conserves token mass and spans are contiguous per source") {
    val rows = CorpusQueries.docPackBins(spark, dir).collect()
    // recount with the SAME tokenizer the query uses — an inline
    // space-only trim would keep a trailing empty token on
    // whitespace-terminated text and silently diverge from tokens()
    val total = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text"))).cast("long")).as("t"))
      .collect().head.getAs[Long]("t")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === total)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_.getAs[Long]("doc_id"))
      // each doc starts exactly where the previous one ended
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_offset") ===
            a.getAs[Long]("start_offset") + a.getAs[Long]("n_tokens"))
        case _ => ()
      }
      assert(ordered.head.getAs[Long]("start_offset") === 0L)
      ordered.foreach { r =>
        assert(r.getAs[Long]("first_bin") <= r.getAs[Long]("last_bin"))
        assert(r.getAs[Long]("bins_spanned") ===
          r.getAs[Long]("last_bin") - r.getAs[Long]("first_bin") + 1)
      }
    }
  }

  test("source_token_entropy lies in [0, ln(vocab)] and normalizes to [0, 1]") {
    val rows = CorpusQueries.sourceTokenEntropy(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val hMax = math.log(r.getAs[Long]("vocab_size").toDouble)
      assert(h >= -1e-6 && h <= hMax + 1e-6,
        s"entropy $h outside [0, $hMax] for ${r.getAs[String]("source")}")
      val n = r.getAs[Double]("norm_entropy")
      assert(n >= 0.0 && n <= 1.0 + 1e-6)
    }
  }

  test("doc_bm25_top is sorted, capped, and rewards matched terms") {
    val rows = CorpusQueries.docBm25Top(spark, dir).collect()
    assert(rows.length === 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("bm25") >= b.getAs[Double]("bm25"))
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms_hit") >= 1 && r.getAs[Long]("n_terms_hit") <= 3)
      assert(r.getAs[Double]("bm25") > 0.0)
    }
  }

  test("supplier_pareto: cumulative share is monotone, head flag is a prefix") {
    val rows = RelationalQueries.supplierPareto(spark, dir).collect()
      .sortBy(_.getAs[Int]("rk"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("cum_share") <= b.getAs[Double]("cum_share") + 1e-9)
        // once the head flag drops it never comes back
        assert(a.getAs[Boolean]("in_top80") || !b.getAs[Boolean]("in_top80"))
      case _ => ()
    }
    assert(rows.head.getAs[Boolean]("in_top80"))
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-5)
    // the 80% head must cover at least 80% of revenue
    val head = rows.filter(_.getAs[Boolean]("in_top80"))
    assert(head.last.getAs[Double]("cum_share") >= 0.8 - 1e-6)
  }

  test("range_join_binned plans as an equi-join, not a nested loop") {
    val df = AnalyticsQueries.rangeJoinBinned(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "binned range join must not degenerate to a nested loop")
    assert(!physical.contains("CartesianProduct"))
    // every promo window contains at least its own opening purchase
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Long]("n_purchases") >= 1)
      assert(r.getAs[Long]("n_users") >= 1)
    }
  }

  test("range_join_binned matches a brute-force non-equi recount") {
    val got = AnalyticsQueries.rangeJoinBinned(spark, dir).collect()
      .map(r => r.getAs[Long]("promo_id") -> r.getAs[Long]("n_events")).toMap
    val ev = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("user_id")),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val w = 6L * 3600 * 1000000
    val expected = ev.filter { case (_, u, t, _) =>
      t == "purchase" && u.exists(_ % 50 == 0)
    }.map { case (id, _, _, s) =>
      id -> ev.count { case (_, _, _, us) => us >= s && us < s + w }.toLong
    }.toMap
    assert(got === expected)
  }
}
