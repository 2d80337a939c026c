package graft.queries

import scala.math.BigDecimal.RoundingMode

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-8 additions, re-derived from
  * the raw tables at sf0.001: the KMV pair-overlap estimator, the
  * histogram quantile sketch's within-bin guarantee, the Ljung–Box
  * statistic's consistency with the published ACF, LPA modularity, and
  * the character-entropy quality signal. */
class Round8Spec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).toDouble

  test("user_kmv_overlap: pair sketch combine matches an independent replay") {
    val byType = Tables.events(spark, dir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      .distinct.groupBy(_._1)
      .view.mapValues(_.map(p => md5h60(p._2.toString)).distinct.sorted).toMap
    val rows = AnalyticsQueries.userKmvOverlap(spark, dir).collect()
    val pairs = byType.keys.toSeq.sorted.combinations(2).collect {
      case Seq(a, b) if byType(a).toSet.intersect(byType(b).toSet).nonEmpty =>
        (a, b)
    }.toSeq
    assert(rows.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
      .toSeq === pairs)
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val skA = byType(ta).take(128).toSet
      val skB = byType(tb).take(128).toSet
      val union = (skA ++ skB).toSeq.sorted
      val kk = math.min(128, union.size)
      val bottom = union.take(kk)
      val matches = bottom.count(h => skA(h) && skB(h)).toLong
      val estUnion =
        if (union.size < 128) union.size.toLong
        else (BigInt(127) * BigInt(2).pow(60) / bottom.last).toLong
      val estInter = (BigInt(matches) * estUnion / kk).toLong
      val exact = byType(ta).toSet.intersect(byType(tb).toSet).size.toLong
      assert(r.getAs[Long]("n_union_sk") === union.size.toLong, s"($ta,$tb)")
      assert(r.getAs[Long]("matches") === matches, s"($ta,$tb)")
      assert(r.getAs[Long]("est_union") === estUnion, s"($ta,$tb)")
      assert(r.getAs[Long]("est_inter") === estInter, s"($ta,$tb)")
      assert(r.getAs[Long]("exact_inter_hashes") === exact, s"($ta,$tb)")
      assert(r.getAs[Long]("jaccard_est_ppm") === matches * 1000000L / kk)
    }
  }

  test("value_hist_quantiles: exact ranks replayed; estimate honors the bin bound") {
    val vs = Tables.events(spark, dir)
      .filter("value IS NOT NULL")
      .select("value").collect()
      .map(r => math.floor(r.getAs[Double]("value") * 1e6).toLong)
      .sorted
    val n = vs.length.toLong
    val rows = AnalyticsQueries.valueHistQuantiles(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("q_pct")).toSeq === Seq(25L, 50L, 75L, 90L, 99L))
    rows.foreach { r =>
      val q = r.getAs[Long]("q_pct")
      val rank = (n * q + 99) / 100
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("exact_micro") === vs((rank - 1).toInt), s"q=$q")
      // the histogram guarantee: estimate and true order statistic share
      // a bin, so the error is bounded by that bin's width
      assert(r.getAs[Boolean]("within_bin"), s"q=$q escaped its bin")
      assert(r.getAs[Long]("abs_err") ===
        math.abs(r.getAs[Long]("est_micro") - r.getAs[Long]("exact_micro")))
    }
  }

  test("sensor_ljung_box: consistent with the published ACF within rounding") {
    val acf = TimeSeriesQueries.sensorAcf(spark, dir).collect()
      .map(r => (r.getAs[String]("sensor_id"), r.getAs[Int]("lag"),
        r.getAs[Double]("acf"))).toSeq
    val rows = TimeSeriesQueries.sensorLjungBox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("sensor_id")
      val n = r.getAs[Long]("n_obs")
      assert(r.getAs[Long]("lags") === 6L)
      val q = r.getAs[Double]("q_stat")
      // rebuild Q from the 6-dp-rounded published r_k: must agree with
      // the exact-form statistic to the rounding noise of 6 squared
      // terms (each r_k off by ≤5e-7 → Q off by ≪ 0.01 at these n)
      val approx = n * (n + 2) * acf.collect {
        case (`s`, k, r_k) => r_k * r_k / (n - k)
      }.sum
      assert(math.abs(q - approx) < 0.01, s"$s: q=$q approx=$approx")
      assert(r.getAs[Boolean]("white_noise_rejected") === (q > 12.591587))
    }
  }

  test("part_community_modularity: contributions recomputed from raw edges") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val pks = grp.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).iterator // iterator: a Map.collect to tuples would dedup by src
      .collect { case (e, os) if os.size >= 2 => e }.toSeq
    val m = edges.size.toLong
    val labels = AnalyticsQueries.partLabelPropagation(spark, dir).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("community")).toMap
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val dSum = labels.toSeq.groupBy(_._2)
      .view.mapValues(_.map(p => deg(p._1)).sum).toMap
    val internal = edges.filter(e => labels(e._1) == labels(e._2))
      .groupBy(e => labels(e._1)).view.mapValues(_.size.toLong).toMap
    val rows = AnalyticsQueries.partCommunityModularity(spark, dir).collect()
    assert(rows.length === dSum.size)
    var tnum = BigInt(0)
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val lc = internal.getOrElse(c, 0L)
      val dc = dSum(c)
      val num = BigInt(4) * m * lc - BigInt(dc) * dc
      tnum += num
      assert(r.getAs[Long]("n_edges") === m)
      assert(r.getAs[Long]("internal_edges") === lc, s"community $c")
      assert(r.getAs[Long]("degree_sum") === dc, s"community $c")
      assert(r.getAs[Long]("contribution_ppm") ===
        (num * 1000000 / (BigInt(4) * m * m)).toLong, s"community $c")
    }
    val expectedQ = (tnum * 1000000 / (BigInt(4) * m * m)).toLong
    assert(rows.forall(_.getAs[Long]("q_total_ppm") == expectedQ))
    // the random-basket TPC-H graph has no planted communities, so LPA
    // collapses dense regions together; if it reaches ONE community the
    // Newman identity forces Q = 0 exactly (L=m, d=2m) — the useful
    // invariant either way is Q ≤ 0 ≤ ... ≤ 1e6 bounds
    if (rows.length == 1) assert(expectedQ === 0L, "single community must score 0")
    assert(expectedQ <= 1000000L)
  }

  test("modularity on a planted partition: exact Q, and a bridge lowers it") {
    import spark.implicits._
    // two disjoint K4 cliques: LPA's smallest-label tie-break converges
    // each clique to its min id in 2 rounds; m = 12, each community has
    // L_c = 6, d_c = 12 → contribution (4·12·6 − 144)/(4·144) = 1/4
    // exactly, Q = 1/2 — the textbook planted-partition value
    val cliques = (for {
      base <- Seq(1L, 11L)
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)).toDF("src", "dst")
    val rows = AnalyticsQueries.partCommunityModularityFrom(cliques).collect()
    assert(rows.map(r => (r.getAs[Long]("community"),
      r.getAs[Long]("community_size"), r.getAs[Long]("internal_edges"),
      r.getAs[Long]("degree_sum"), r.getAs[Long]("contribution_ppm"))).toSet ===
      Set((1L, 4L, 6L, 12L, 250000L), (11L, 4L, 6L, 12L, 250000L)))
    assert(rows.forall(_.getAs[Long]("q_total_ppm") == 500000L))

    // one bridge edge between the cliques: communities survive (the
    // bridge is a 1-vote minority at both endpoints) but Q must drop —
    // m = 13, L_c = 6, d_c = 13 → Q = 2·(4·13·6 − 169)/(4·169)
    val bridged = cliques.unionAll(Seq((4L, 11L)).toDF("src", "dst"))
    val b = AnalyticsQueries.partCommunityModularityFrom(bridged).collect()
    assert(b.length === 2)
    assert(b.forall(_.getAs[Long]("q_total_ppm") < 500000L))
    assert(b.map(_.getAs[Long]("contribution_ppm")).sum ===
      2 * ((BigInt(4 * 13 * 6 - 169) * 1000000) / (BigInt(4) * 169)).toLong)
  }

  test("customer_tcloseness: total-variation distance recomputed per class") {
    val rows = Tables.customer(spark, dir)
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => ((r.getAs[Int]("c_nationkey").toLong,
        math.floor(r.getAs[Double]("c_acctbal") / 1000).toLong),
        r.getAs[String]("c_mktsegment")))
    val n = rows.length.toLong
    val glob = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = PipelineQueries.customerTcloseness(spark, dir).collect()
    val byClass = rows.groupBy(_._1)
    assert(got.length === byClass.size)
    got.foreach { r =>
      val key = (r.getAs[Int]("nat").toLong, r.getAs[Long]("bal_bucket"))
      val members = byClass(key).map(_._2)
      val g = members.length.toLong
      val cc = members.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // ½·Σ over ALL segments of |c_s·N − C_s·g| (absent segments
      // contribute C_s·g), in truncating ppm
      val tNum = glob.map { case (s, cs) =>
        (BigInt(cc.getOrElse(s, 0L)) * n - BigInt(cs) * g).abs
      }.sum
      val tPpm = (tNum * 1000000 / (BigInt(2) * g * n)).toLong
      assert(r.getAs[Long]("class_size") === g, s"class $key")
      assert(r.getAs[Long]("t_ppm") === tPpm, s"class $key")
      assert(r.getAs[Boolean]("breach") === (tPpm > 200000L), s"class $key")
    }
  }

  test("knn_ndcg: ideal DCG pinned; quality non-decreasing in probe budget") {
    val rows = SimilarityQueries.knnNdcg(spark, dir).collect()
      .map(r => r.getAs[Int]("probes") ->
        (r.getAs[Long]("mean_ndcg_ppm"), r.getAs[Long]("min_ndcg_ppm"),
          r.getAs[Long]("idcg_micro"))).toMap
    assert(rows.keySet === Set(1, 2, 4))
    // idcg = Σ (6−r)·round(1e6/log2(r+1)) — recomputed independently
    val idcg = (1 to 5).map(r =>
      (6L - r) * math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))).sum
    rows.values.foreach { case (mean, mn, id) =>
      assert(id === idcg)
      assert(mn >= 0L && mn <= mean && mean <= 1000000L)
    }
    // a larger probe budget searches a SUPERSET of candidates under the
    // same similarity order, so each query's top-5 dominates position-
    // wise and NDCG cannot drop
    assert(rows(2)._1 >= rows(1)._1)
    assert(rows(4)._1 >= rows(2)._1)
  }

  test("score_temperature_fit: grid bookkeeping and argmin are consistent") {
    val rows = TextQueries.scoreTemperatureFit(spark, dir).collect()
    assert(rows.length === 9)
    assert(rows.map(_.getAs[Double]("temperature")).toSeq ===
      Seq(0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 3.0, 4.0))
    assert(rows.map(_.getAs[Long]("n_docs")).distinct.length === 1)
    val minNll = rows.map(_.getAs[Long]("nll_micro")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_nll_micro") ===
        r.getAs[Long]("nll_micro") / r.getAs[Long]("n_docs"))
      assert(r.getAs[Boolean]("is_best") ===
        (r.getAs[Long]("nll_micro") == minNll))
    }
    assert(rows.count(_.getAs[Boolean]("is_best")) >= 1)
  }

  test("classifier_auc: rank-sum AUC equals brute pair counting") {
    // replicate the deterministic classifier head (tokens → hashed
    // weights → score → 6-dp sigmoid micro) in plain Scala, then count
    // positive-over-negative pairs directly — the O(n²) definition the
    // rank-sum identity must reproduce exactly, ties at half weight
    val ws = " \t\n\u000B\f\r"
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars").collect()
      .map { r =>
        val text = r.getAs[String]("text")
        val trimmed = text.dropWhile(ws.contains(_)).reverse
          .dropWhile(ws.contains(_)).reverse
        val toks =
          if (trimmed.isEmpty) Array.empty[String]
          else trimmed.split("\\s+")
        val y = if (r.getAs[Long]("n_chars") >= 300) 1L else 0L
        val sw = toks.map(t => (md5h60(t) % 256L) * 2654435761L % 1001L - 500L).sum
        val score = math.floor(sw.toDouble * 1000.0 / toks.length) / 1e6
        val prob = BigDecimal.valueOf(1.0 / (1.0 + math.exp(score * -4)))
          .setScale(6, RoundingMode.HALF_UP)
        ((prob * 1000000).toLong, y)
      }
    val pos = docs.filter(_._2 == 1L).map(_._1)
    val neg = docs.filter(_._2 == 0L).map(_._1)
    var u1x2 = BigInt(0)
    for (p <- pos; n <- neg)
      u1x2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val expected =
      (u1x2 * 1000000 / (BigInt(2) * pos.length * neg.length)).toLong
    val row = TextQueries.classifierAuc(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("auc_ppm") === expected)
    assert(row.getAs[Long]("gini_ppm") === expected * 2 - 1000000L)
  }

  test("doc_char_entropy: per-doc entropy replayed from raw text") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val rows = TextQueries.docCharEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    var checked = 0
    docs.foreach { case (id, text) =>
      val counts = text.toLowerCase.filter(c => c.isDigit || (c >= 'a' && c <= 'z'))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      if (counts.isEmpty) assert(!rows.contains(id), s"doc $id should be absent")
      else {
        val n = counts.values.sum
        val sumClc = counts.values.map(c =>
          BigDecimal.valueOf(c * round6(math.log(c.toDouble)))
            .setScale(10, RoundingMode.HALF_UP)).sum.toDouble
        val h = round6(round6(math.log(n.toDouble)) - sumClc / n)
        val r = rows(id)
        assert(r.getAs[Long]("n_chars") === n, s"doc $id")
        assert(r.getAs[Double]("h_nats") === h, s"doc $id")
        assert(r.getAs[Long]("max_char_share_ppm") ===
          counts.values.max * 1000000L / n, s"doc $id")
        assert(r.getAs[Boolean]("low_entropy") === (h < 2.0), s"doc $id")
        checked += 1
      }
    }
    assert(checked > 0, "fixture yielded no scorable documents")
  }

  test("orders_median_of_means: estimate replayed from raw orders") {
    val prices = Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getAs[Long]("o_orderkey"),
        (BigDecimal.valueOf(r.getAs[Double]("o_totalprice"))
          .setScale(6, RoundingMode.HALF_UP) * 1000000).toLong))
    val means = prices.groupBy(p => p._1 % 32).map { case (_, xs) =>
      val s = xs.map(x => BigInt(x._2)).sum
      (s / xs.length).toLong
    }.toSeq.sorted
    val nb = means.length
    val mom = (BigInt(means((nb - 1) / 2)) + BigInt(means(nb / 2))) / 2
    val tot = prices.map(p => BigInt(p._2)).sum
    val mean = tot / prices.length
    val r = StatQueries.ordersMedianOfMeans(spark, dir).collect().head
    assert(r.getAs[Long]("n_buckets") === nb.toLong)
    assert(r.getAs[Long]("n_orders") === prices.length.toLong)
    assert(r.getAs[Long]("mean_micro") === mean.toLong)
    assert(r.getAs[Long]("mom_micro") === mom.toLong)
    assert(r.getAs[Long]("mom_minus_mean_micro") === (mom - mean).toLong)
  }

  test("part_assoc_rules: metrics replayed from raw baskets") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    val nOrders = Tables.orders(spark, dir).count()
    val supp = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val joint = li.groupBy(_._1).values.flatMap { basket =>
      val pks = basket.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val rules = joint.toSeq.flatMap { case ((a, b), nj) =>
      Seq((a, b, nj, supp(a), supp(b)), (b, a, nj, supp(b), supp(a)))
    }
    def confPpm(r: (Long, Long, Long, Long, Long)) = r._3 * 1000000L / r._4
    val expected = rules.sortBy(r => (-confPpm(r), r._1, r._2)).take(20)
    val got = AnalyticsQueries.partAssocRules(spark, dir).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (row, (a, c, nj, na, nc)) =>
      assert(row.getAs[Long]("ante") === a)
      assert(row.getAs[Long]("cons") === c)
      assert(row.getAs[Long]("n_joint") === nj)
      assert(row.getAs[Long]("conf_ppm") === nj * 1000000L / na)
      assert(row.getAs[Long]("lift_ppm") ===
        (BigInt(nj) * nOrders * 1000000 / (BigInt(na) * nc)).toLong)
      assert(row.getAs[Long]("leverage_ppm") ===
        ((BigInt(nj) * nOrders - BigInt(na) * nc) * 1000000 /
          (BigInt(nOrders) * nOrders)).toLong)
      if (na == nj) assert(row.isNullAt(row.fieldIndex("conviction_ppm")))
      else assert(row.getAs[Long]("conviction_ppm") ===
        (BigInt(na) * (nOrders - nc) * 1000000 /
          (BigInt(nOrders) * (na - nj))).toLong)
    }
  }

  test("loo_source_influence: ablation identity from raw totals") {
    val docs = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val nTot = docs.length.toLong
    val cTot = docs.map(d => BigInt(d._2)).sum
    val rows = PipelineQueries.looSourceInfluence(spark, dir).collect()
    assert(rows.map(_.getAs[String]("source")).toSeq ===
      docs.map(_._1).distinct.sorted.toSeq)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = docs.filter(_._1 == src)
      val nS = mine.length.toLong
      val cS = mine.map(d => BigInt(d._2)).sum
      assert(r.getAs[Long]("n_docs") === nS)
      assert(r.getAs[Long]("chars") === cS.toLong)
      assert(r.getAs[Long]("share_ppm") === (cS * 1000000 / cTot).toLong)
      val mean = cTot * 1000000 / nTot
      val loo = (cTot - cS) * 1000000 / (nTot - nS)
      assert(r.getAs[Long]("mean_micro") === mean.toLong)
      assert(r.getAs[Long]("loo_mean_micro") === loo.toLong)
      assert(r.getAs[Long]("delta_micro") === (loo - mean).toLong)
    }
  }

  test("source_unimax_alloc: waterfill replayed from raw token counts") {
    val toks = Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map { r =>
        val t = r.getAs[String]("text").replaceAll("^\\s+|\\s+$", "")
        (r.getAs[String]("source"),
          if (t.isEmpty) 0L else t.split("\\s+").length.toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val budget = toks.values.sum * 2
    val byCap = toks.toSeq.map { case (s, t) => (s, t, t * 4) }
      .sortBy(r => (r._3, r._1))
    val n = byCap.length
    var prefix = 0L
    val sat = byCap.zipWithIndex.map { case ((_, _, cap), i) =>
      val f = cap * (n - i).toLong + prefix <= budget
      prefix += cap
      f
    }
    assert(sat.zip(sat.tail).forall { case (a, b) => a || !b },
      "saturation must be monotone down the cap order")
    val nSat = sat.count(identity)
    val satTok = byCap.zip(sat).collect { case ((_, _, cap), true) => cap }.sum
    val level =
      if (nSat == n) None else Some((budget - satTok) / (n - nSat))
    val expected = byCap.zip(sat).map { case ((s, t, cap), f) =>
      (s, t, cap, f, if (f) cap else level.get)
    }.sortBy(_._1)
    val rows = PipelineQueries.sourceUnimaxAlloc(spark, dir).collect()
    assert(rows.length === n)
    rows.zip(expected).foreach { case (row, (s, t, cap, f, alloc)) =>
      assert(row.getAs[String]("source") === s)
      assert(row.getAs[Long]("src_tokens") === t)
      assert(row.getAs[Long]("cap_tokens") === cap)
      assert(row.getAs[Long]("budget_tokens") === budget)
      assert(row.getAs[Boolean]("saturated") === f)
      assert(row.getAs[Long]("alloc_tokens") === alloc)
      assert(row.getAs[Long]("alloc_tokens") <= cap,
        s"$s allocated beyond its repeat cap")
      assert(row.getAs[Long]("epochs_ppm") === alloc * 1000000L / t)
    }
    val total = expected.map(_._5).sum
    assert(total <= budget && budget - total < n.toLong * 2,
      "waterfill must spend the budget up to integer-division remainder")
  }

  test("er_fellegi_sunter: m/u estimation replayed over the SNM candidates") {
    val docs = Tables.documents(spark, dir)
    val cand = DedupQueries.snmCandidates(docs, DedupQueries.snmKey(0))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val sh = graft.operators.DedupOps.docShingles(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("shingles").toSet).toMap
    val meta = docs.select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("source"),
          r.getAs[Long]("n_chars"))).toMap
    case class P(m: Boolean, lang: Boolean, source: Boolean, len: Boolean)
    val pairs = cand.flatMap { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      if (sa.isEmpty || sb.isEmpty) None
      else {
        val (ma, mb) = (meta(a), meta(b))
        Some(P(sa.intersect(sb).size * 3 >= sa.size + sb.size,
          ma._1 == mb._1, ma._2 == mb._2,
          math.abs(ma._3 - mb._3) * 10 <= math.max(ma._3, mb._3)))
      }
    }
    val nM = pairs.count(_.m).toLong
    val nU = pairs.count(!_.m).toLong
    val rows = DedupQueries.erFellegiSunter(spark, dir).collect()
      .map(r => r.getAs[String]("field") -> r).toMap
    assert(rows.keySet === Set("lang", "source", "len10"))
    assert(nM > 0 && nU > 0, "fixture must yield both matches and non-matches")
    Seq(("lang", (p: P) => p.lang), ("source", (p: P) => p.source),
      ("len10", (p: P) => p.len)).foreach { case (name, agree) =>
      val r = rows(name)
      val aM = pairs.count(p => p.m && agree(p)).toLong
      val aU = pairs.count(p => !p.m && agree(p)).toLong
      assert(r.getAs[Long]("n_match") === nM, name)
      assert(r.getAs[Long]("n_unmatch") === nU, name)
      assert(r.getAs[Long]("agree_match") === aM, name)
      assert(r.getAs[Long]("agree_unmatch") === aU, name)
      val mPpm = aM * 1000000L / nM
      val uPpm = aU * 1000000L / nU
      assert(r.getAs[Long]("m_ppm") === mPpm, name)
      assert(r.getAs[Long]("u_ppm") === uPpm, name)
      if (mPpm > 0 && uPpm > 0)
        assert(r.getAs[Double]("w_agree_nats") ===
          round6(math.log(mPpm.toDouble / uPpm)), name)
      else assert(r.isNullAt(r.fieldIndex("w_agree_nats")), name)
      if (mPpm < 1000000L && uPpm < 1000000L)
        assert(r.getAs[Double]("w_disagree_nats") ===
          round6(math.log((1000000L - mPpm).toDouble / (1000000L - uPpm))), name)
      else assert(r.isNullAt(r.fieldIndex("w_disagree_nats")), name)
    }
  }

  test("doc_kn_perplexity: held-out scoring replayed from raw text") {
    def toks(s: String): Array[String] = {
      val t = s.replaceAll("^\\s+|\\s+$", "")
      if (t.isEmpty) Array.empty else t.split("\\s+")
    }
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), toks(r.getAs[String]("text"))))
    def bigrams(ts: Array[String]) = ts.iterator.sliding(2).withPartial(false)
      .map(p => (p.head, p(1))).toSeq
    val train = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._2))
    val b = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val h = train.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.distinct.size.toLong)).toMap // (c1, n1f)
    val t2 = b.keySet.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = b.size.toLong
    val v2 = t2.size.toLong
    val rows = TextQueries.docKnPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    var checked = 0
    docs.filter(_._1 % 2 == 1).foreach { case (id, ts) =>
      val bgs = bigrams(ts)
      if (bgs.isEmpty) assert(!rows.contains(id), s"doc $id should be absent")
      else {
        val costs = bgs.map { case (w1, w2) =>
          val pc = (t2.getOrElse(w2, 0L) + 1).toDouble / (nTypes + v2 + 1)
          val p = b.get((w1, w2)) match {
            case Some(c12) =>
              val (c1, n1f) = h(w1)
              (c12.toDouble - 0.75) / c1 + 0.75 * n1f.toDouble / c1 * pc
            case None => h.get(w1) match {
              case Some((c1, n1f)) => 0.75 * n1f.toDouble / c1 * pc
              case None => pc
            }
          }
          BigDecimal.valueOf(-math.log(p) * 1e6)
            .setScale(0, RoundingMode.HALF_UP).toLong
        }
        val r = rows(id)
        assert(r.getAs[Long]("n_bg") === bgs.length.toLong, s"doc $id")
        assert(r.getAs[Long]("n_unseen_pair") ===
          bgs.count(bg => !b.contains(bg)).toLong, s"doc $id")
        assert(r.getAs[Long]("n_unseen_head") ===
          bgs.count(bg => !h.contains(bg._1)).toLong, s"doc $id")
        assert(r.getAs[Long]("nll_micro") === costs.sum, s"doc $id")
        assert(r.getAs[Long]("avg_nll_micro") === costs.sum / bgs.length, s"doc $id")
        assert(r.getAs[Double]("ppl") ===
          round6(math.exp((costs.sum / bgs.length).toDouble / 1e6)), s"doc $id")
        checked += 1
      }
    }
    assert(checked > 0, "fixture yielded no held-out documents")
  }

  test("classifier_lift_table: deciles and lifts replayed from the scored frame") {
    // replay the deterministic classifier head (same plain-Scala replica
    // the AUC test uses), assign SQL-standard ntile(10) buckets under
    // (pm desc, doc_id), and recompute every lift/gain with BigInt
    // truncating division
    val ws = " \t\n\u000B\f\r"
    val scored = Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars").collect()
      .map { r =>
        val text = r.getAs[String]("text")
        val trimmed = text.dropWhile(ws.contains(_)).reverse
          .dropWhile(ws.contains(_)).reverse
        val toks =
          if (trimmed.isEmpty) Array.empty[String]
          else trimmed.split("\\s+")
        val y = if (r.getAs[Long]("n_chars") >= 300) 1L else 0L
        val sw = toks.map(t => (md5h60(t) % 256L) * 2654435761L % 1001L - 500L).sum
        val score = math.floor(sw.toDouble * 1000.0 / toks.length) / 1e6
        val prob = BigDecimal.valueOf(1.0 / (1.0 + math.exp(score * -4)))
          .setScale(6, RoundingMode.HALF_UP)
        (r.getAs[Long]("doc_id"), (prob * 1000000).toLong, y)
      }
      .sortBy { case (id, pm, _) => (-pm, id) }
    val n = scored.length
    val big = n % 10
    val szSmall = n / 10
    val bucketOf = (rn: Int) => { // 1-based rank → 1-based ntile bucket
      val cutoff = big * (szSmall + 1)
      if (rn <= cutoff) (rn - 1) / (szSmall + 1) + 1
      else big + (rn - cutoff - 1) / szSmall + 1
    }
    val byDec = scored.zipWithIndex
      .groupBy { case (_, i) => bucketOf(i + 1) }
      .map { case (d, rs) => d -> (rs.length.toLong, rs.map(_._1._3).sum) }
    val nTotal = n.toLong
    val posTotal = scored.map(_._3).sum
    val rows = TextQueries.classifierLiftTable(spark, dir).collect()
      .map(r => r.getAs[Int]("decile") -> r).toMap
    assert(rows.size === 10)
    var cumN = 0L; var cumPos = 0L
    (1 to 10).foreach { d =>
      val (nd, posd) = byDec(d)
      cumN += nd; cumPos += posd
      val r = rows(d)
      assert(r.getAs[Long]("n") === nd, s"decile $d n")
      assert(r.getAs[Long]("n_pos") === posd, s"decile $d n_pos")
      assert(r.getAs[Long]("lift_ppm") ===
        (BigInt(posd) * nTotal * 1000000 / (BigInt(nd) * posTotal)).toLong,
        s"decile $d lift")
      assert(r.getAs[Long]("cum_gain_ppm") ===
        (BigInt(cumPos) * 1000000 / posTotal).toLong, s"decile $d gain")
      assert(r.getAs[Long]("cum_lift_ppm") ===
        (BigInt(cumPos) * nTotal * 1000000 / (BigInt(cumN) * posTotal)).toLong,
        s"decile $d cum lift")
    }
    // the curve's boundary facts: all docs accounted for, gain ends at 1
    assert(cumN === nTotal)
    assert(rows(10).getAs[Long]("cum_gain_ppm") === 1000000L)
  }

  test("embedding_mrl_recall: full-dim self-check and truncation monotonicity") {
    val rows = SimilarityQueries.queries("embedding_mrl_recall")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("dims"), r.getAs[Long]("n_returned"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_5")))
    assert(rows.map(_._1).toSeq === Seq(8, 16, 32, 64))
    rows.foreach { case (d, ret, hits, rec) =>
      assert(ret === 50L, s"dims $d should return 10 queries x 5")
      assert(hits >= 0L && hits <= 50L)
      assert(rec === math.floor(hits * 1e4 / ret) / 1e4, s"dims $d ratio")
    }
    // d = 64 IS the truth — recall exactly 1 by construction
    assert(rows.last._3 === 50L)
    assert(rows.last._4 === 1.0)
    // on this corpus more prefix dims never hurt (not guaranteed in
    // general; pins the fixture so a scoring regression shows up)
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "recall should be non-decreasing in prefix dims on this corpus")
  }

  test("sensor_naive_mase: per-sensor ratio replayed from the hourly series") {
    val hours = TimeSeriesQueries.hourlyMeans(spark, dir)
      .selectExpr("sensor_id", "unix_micros(h) AS h_us", "x_micro")
      .collect()
      .map(r => (r.getAs[String]("sensor_id"), r.getAs[Long]("h_us"),
        r.getAs[Long]("x_micro")))
      .groupBy(_._1)
    val rows = TimeSeriesQueries.queries("sensor_naive_mase")(spark, dir)
      .collect().map(r => r.getAs[String]("sensor_id") -> r).toMap
    var checked = 0
    hours.foreach { case (sid, rs) =>
      val xs = rs.sortBy(_._2).map(_._3)
      val e1 = xs.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
      val e24 = xs.indices.drop(24).map(i => math.abs(xs(i) - xs(i - 24)))
      if (e24.nonEmpty && e1.sum > 0) {
        val r = rows(sid)
        assert(r.getAs[Long]("n_hours") === xs.length.toLong, s"$sid n_hours")
        assert(r.getAs[Long]("sum_e1") === e1.sum, s"$sid sum_e1")
        assert(r.getAs[Long]("sum_e24") === e24.sum, s"$sid sum_e24")
        assert(r.getAs[Long]("mase_ppm") ===
          (BigInt(e24.sum) * e1.length * 1000000 /
            (BigInt(e1.sum) * e24.length)).toLong, s"$sid mase")
        checked += 1
      } else assert(!rows.contains(sid), s"$sid should be excluded")
    }
    assert(checked > 0, "no sensor had a defined MASE")
  }

  test("customer_gini: rank-sum identity equals the mean-absolute-difference form") {
    val xs = Tables.orders(spark, dir).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .map { case (_, rs) =>
        rs.map(r => BigDecimal(r.getAs[Double]("o_totalprice"))
          .setScale(6, RoundingMode.HALF_UP)).sum
          .*(BigDecimal(1000000)).toBigInt.toLong
      }.toSeq.sorted
    val n = xs.length
    val sx = xs.map(BigInt(_)).sum
    // O(n²) definition: G = Σ_i Σ_j |x_i − x_j| / (2 n² x̄) = Σ|..| / (2 n sx)
    var sad = BigInt(0)
    for (i <- xs.indices; j <- xs.indices) sad += (BigInt(xs(i)) - BigInt(xs(j))).abs
    val giniDef = sad * 1000000 / (BigInt(2) * n * sx)
    val row = AnalyticsQueries.queries("customer_gini")(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_customers") === n.toLong)
    assert(row.getAs[Long]("rev_sum_micro") === sx.toLong)
    // rank-sum identity and the pairwise definition agree except for the
    // truncation of the final division — recompute the identity exactly
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val giniRank = (BigInt(2) * six - BigInt(n + 1) * sx) * 1000000 / (BigInt(n) * sx)
    assert(giniRank === giniDef, "identity vs definition (exact pre-truncation)")
    assert(row.getAs[Long]("gini_ppm") === giniRank.toLong)
    val topDecile = xs.drop(n - n / 10).map(BigInt(_)).sum
    assert(row.getAs[Long]("top_decile_ppm") === (topDecile * 1000000 / sx).toLong)
  }

  test("part_price_index: base-year identities and Fisher betweenness") {
    val rows = AnalyticsQueries.queries("part_price_index")(spark, dir)
      .collect()
      .map(r => r.getAs[Int]("yr") ->
        (r.getAs[Long]("laspeyres_ppm"), r.getAs[Long]("paasche_ppm"),
          r.getAs[Long]("fisher_ppm"), r.getAs[Long]("n_parts")))
      .toMap
    // the base year's index is exactly 1 by construction, all three forms
    val (l0, p0, f0, _) = rows(1995)
    assert(l0 === 1000000L && p0 === 1000000L && f0 === 1000000L)
    rows.foreach { case (yr, (l, p, f, n)) =>
      assert(n > 0, s"$yr: empty matched basket")
      // Fisher is the geometric mean: between min and max of L and P,
      // and exactly floor(sqrt(L·P))
      assert(f === math.floor(math.sqrt(l.toDouble * p)).toLong, s"$yr fisher")
      assert(f >= math.min(l, p) - 1 && f <= math.max(l, p), s"$yr betweenness")
    }
  }

  test("sensor_spc_rules: every firing replayed from the hourly series, no float σ") {
    val hours = TimeSeriesQueries.hourlyMeans(spark, dir)
      .selectExpr("sensor_id", "unix_micros(h) AS h_us", "x_micro")
      .collect()
      .map(r => (r.getAs[String]("sensor_id"), r.getAs[Long]("h_us"),
        r.getAs[Long]("x_micro")))
      .groupBy(_._1)
    val got = TimeSeriesQueries.queries("sensor_spc_rules")(spark, dir)
      .selectExpr("sensor_id", "unix_micros(h) AS h_us", "rule1", "rule2", "rule4")
      .collect()
      .map(r => (r.getAs[String]("sensor_id"), r.getAs[Long]("h_us")) ->
        (r.getAs[Boolean]("rule1"), r.getAs[Boolean]("rule2"),
          r.getAs[Boolean]("rule4")))
      .toMap
    val expected = scala.collection.mutable.Map.empty[(String, Long), (Boolean, Boolean, Boolean)]
    hours.foreach { case (sid, rs) =>
      val xs = rs.sortBy(_._2)
      val n = BigInt(xs.length)
      val sx = xs.map(r => BigInt(r._3)).sum
      val varNum = n * xs.map(r => BigInt(r._3) * r._3).sum - sx * sx
      val ds = xs.map(r => n * r._3 - sx)
      xs.indices.foreach { i =>
        val d = ds(i)
        val r1 = d * d > 9 * varNum
        val hi2 = (math.max(0, i - 2) to i).count(j => ds(j) > 0 && ds(j) * ds(j) > 4 * varNum)
        val lo2 = (math.max(0, i - 2) to i).count(j => ds(j) < 0 && ds(j) * ds(j) > 4 * varNum)
        val r2 = i >= 2 && (hi2 >= 2 || lo2 >= 2)
        val r4 = i >= 7 &&
          ((i - 7 to i).forall(ds(_) > 0) || (i - 7 to i).forall(ds(_) < 0))
        if (r1 || r2 || r4) expected((sid, xs(i)._2)) = (r1, r2, r4)
      }
    }
    assert(got === expected.toMap, "SPC firings differ from the integer replay")
    assert(got.nonEmpty, "fixture fired no rule — the chart is untested")
  }

  test("customer_rr_histogram: debias is unbiased-by-identity and exact") {
    val rows = PipelineQueries.queries("customer_rr_histogram")(spark, dir).collect()
    val nTotal = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("true_count")).sum === nTotal)
    assert(rows.map(_.getAs[Long]("reported_count")).sum === nTotal)
    // Σ est = 2e6·Σobs − 5·2e5·n = 1e6·n — the estimator's mass identity
    assert(rows.map(_.getAs[Long]("est_micro")).sum === 1000000L * nTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_micro") ===
        2000000L * r.getAs[Long]("reported_count") - 200000L * nTotal)
      assert(r.getAs[Long]("err_micro") ===
        r.getAs[Long]("est_micro") - 1000000L * r.getAs[Long]("true_count"))
    }
  }
}
