package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-3 curation/scoring operators: contracts the oracle compare can't
  * state (independent re-derivations, structural invariants). */
class PipelineOpsR3Spec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("doc_lm_score: scores are negative log-probs, perplexity = exp(-avg)") {
    val rows = TextQueries.docLmScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lp = r.getAs[Double]("avg_logprob")
      assert(lp < 0.0, "smoothed bigram probabilities are < 1 so logs are negative")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      assert(math.abs(r.getAs[Double]("perplexity") - math.exp(-lp)) < 1e-3)
    }
  }

  test("doc_classifier_score: bounded scores, keep consistent with prob") {
    val rows = TextQueries.docClassifierScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      val prob = r.getAs[Double]("prob")
      assert(score >= -0.5 && score <= 0.5, "mean of weights in [-0.5, 0.5]")
      assert(prob > 0.0 && prob < 1.0)
      assert(r.getAs[Boolean]("keep") === (prob >= 0.5))
    }
  }

  test("sensor_ewma matches an independent truncated-EWMA re-derivation") {
    val out = StatQueries.sensorEwma(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    assert(out.nonEmpty)

    // re-derive for one station from the raw shaped rows, straight Scala
    val station = "7"
    val series = ParityQueries.sensorShaped(spark, dir)
      .selectExpr("event_id", "ts", "station_id", "try_cast(value_str AS double) AS v")
      .where(s"station_id = '$station' AND v IS NOT NULL")
      .collect()
      .sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("v"))
    assert(series.nonEmpty)
    series.indices.foreach { i =>
      val window = (0 until math.min(i + 1, 8)).map { j =>
        (series(i - j)._2, (1L << (7 - j)).toDouble)
      }
      val expected = window.map { case (v, w) => v * w }.sum / window.map(_._2).sum
      val got = out(series(i)._1)
      assert(math.abs(got - expected) < 1e-5,
        s"event ${series(i)._1}: ewma $got vs re-derived $expected")
    }
  }

  test("event_type_reachability: BFS hop counts over the transition graph") {
    val rows = RelationalQueries.eventTypeReachability(spark, dir).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Int]("min_hops")).toMap
    assert(rows("view") === 0)
    assert(rows.size === 5, "all five event types reachable in this dense graph")
    rows.foreach { case (n, h) => assert(h >= 0 && h <= 4, s"$n hops $h") }
  }

  test("source_caps keeps at most the cap per source with contiguous ranks") {
    val rows = PipelineQueries.sourceCaps(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.size === 20)
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 15)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to rs.length))
    }
  }

  test("doc_length_outliers flags only the tails, sides consistent") {
    val rows = PipelineQueries.docLengthOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chars")
      val p5 = r.getAs[Double]("p5")
      val p95 = r.getAs[Double]("p95")
      assert(n < p5 || n > p95)
      assert(r.getAs[String]("side") === (if (n < p5) "short" else "long"))
    }
    // the two-sided 5% tails of 500 docs: ~50 outliers, never the bulk
    assert(rows.length > 10 && rows.length < 100)
  }

  test("event_type_pagerank: a probability distribution favoring in-flow") {
    val rows = AnalyticsQueries.eventTypePagerank(spark, dir).collect()
    assert(rows.length === 5)
    val prs = rows.map(_.getAs[Double]("pagerank"))
    prs.foreach(p => assert(p > 0.0 && p < 1.0))
    // this implementation does NOT redistribute dangling-node mass (a
    // sink loses 0.85x its rank per iteration, by design — documented in
    // the scaladoc), so Σpr ≤ 1; it equals 1 only when every node has
    // out-edges, as in this dense fixture. Lower bound: every node keeps
    // at least the damping floor 0.15/N.
    assert(prs.sum <= 1.0 + 1e-3, s"mass ${prs.sum}")
    prs.foreach(p => assert(p >= 0.15 / 5 - 1e-6))
  }

  test("source_temperature_weights flattens the mixture toward uniform") {
    val rows = PipelineQueries.sourceTemperatureWeights(spark, dir).collect()
    assert(rows.length === 20)
    val shares = rows.map(_.getAs[Double]("share"))
    val weights = rows.map(_.getAs[Double]("weight"))
    assert(math.abs(weights.sum - 1.0) < 1e-3)
    // temperature sampling shrinks spread: max/min ratio must not grow
    val shareRatio = shares.max / shares.min
    val weightRatio = weights.max / weights.min
    assert(weightRatio <= shareRatio + 1e-9,
      s"T=2 must flatten: $weightRatio vs $shareRatio")
  }

  test("vocab_zipf_fit: natural-ish corpus has a negative slope") {
    val r = PipelineQueries.vocabZipfFit(spark, dir).collect().head
    // the synthetic corpus has a tiny vocabulary (~31 distinct tokens at
    // sf0.001) — the fit just needs enough points to be meaningful
    assert(r.getAs[Long]("n") > 20)
    assert(r.getAs[Double]("slope") < 0.0)
    assert(r.getAs[Double]("intercept") > 0.0)
  }

  test("doc_quality_deciles: monotone non-overlapping score bands") {
    val rows = PipelineQueries.docQualityDeciles(spark, dir).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_score") <= b.getAs[Double]("min_score"))
    }
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(n === 500)
  }

  test("customers_all_priorities: division result verified by recount") {
    val got = RelationalQueries.customersAllPriorities(spark, dir).collect()
      .map(_.getAs[Long]("o_custkey")).toSet
    val orders = graft.sources.Tables.orders(spark, dir)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[String]("o_orderpriority")))
    val nPrio = orders.map(_._2).distinct.length
    val expected = orders.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.length == nPrio).keySet
    assert(got === expected)
    assert(got.nonEmpty && got.size < orders.map(_._1).distinct.length,
      "division must discriminate: some but not all customers")
  }
}
