package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-6 late operators: changepoint
  * localization, Kaplan–Meier survival, mutual-NN mining, edit-distance
  * blocking, Wasserstein drift, l-diversity, local clustering, trigram
  * paths, bootstrap CI. Every recount re-derives the expected output from
  * the raw tables with independent Scala code (no shared query plumbing),
  * at sf0.001 where exhaustive checks are cheap. */
class Round6LateSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The hourly-mean series recounted from the RAW readings with
    * independent BigDecimal arithmetic (no shared query plumbing):
    * per-reading HALF_UP quantization to 6 dp (the double→DECIMAL(18,6)
    * cast contract), exact decimal sum, ×10⁶ to integer micro-units, ONE
    * truncating division by the count — the r7 hourlyMeans contract
    * (truncated micro-unit mean, no round(double/n, 6) anywhere). */
  private def hourlySeries(): Map[String, Vector[Long]] = {
    val rows = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error" && col("value").isNotNull)
      .select(col("event_type").as("sensor_id"),
        date_trunc("hour", col("ts")).as("h"), col("value"))
      .collect()
    rows.groupBy(r =>
      (r.getAs[String]("sensor_id"), r.getAs[java.sql.Timestamp]("h")))
      .map { case ((s, h), rs) =>
        val sumMicro = rs.map(r => BigDecimal(r.getAs[Double]("value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact).sum
        (s, h, sumMicro / rs.length) // positive → truncation = both engines
      }
      .groupBy(_._1)
      .map { case (s, cells) =>
        s -> cells.toVector.sortBy(_._2.getTime).map(_._3)
      }
  }

  test("sensor_changepoint: argmax matches an exhaustive gain scan") {
    val series = hourlySeries()
    val rows = TimeSeriesQueries.sensorChangepoint(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("sensor_id")
      val xm = series(s)
      val xc = xm.map(_ / 10000)
      val n = xm.length
      assert(r.getAs[Long]("n_hours") === n.toLong)
      def gain(t: Int): Long = {
        val sl = xc.take(t).sum; val sr = xc.drop(t).sum; val tot = sl + sr
        sl * sl / t + sr * sr / (n - t) - tot * tot / n
      }
      val best = (1 until n).maxBy(t => (gain(t), -t))
      assert(r.getAs[Long]("cp_pos") === best.toLong, s"argmax mismatch for $s")
      assert(r.getAs[Long]("gain_c2") === gain(best))
      assert(r.getAs[Long]("left_mean_micro") === xm.take(best).sum / best)
      assert(r.getAs[Long]("right_mean_micro") === xm.drop(best).sum / (n - best))
    }
  }

  test("sensor_changepoint localizes a synthetic step exactly") {
    // a clean level shift must be found at its true position: the gain at
    // the true split dominates every other candidate for a noiseless step
    val xm = Vector.fill(30)(100000000L) ++ Vector.fill(20)(300000000L)
    val xc = xm.map(_ / 10000)
    val n = xm.length
    def gain(t: Int): Long = {
      val sl = xc.take(t).sum; val sr = xc.drop(t).sum; val tot = sl + sr
      sl * sl / t + sr * sr / (n - t) - tot * tot / n
    }
    assert((1 until n).maxBy(t => (gain(t), -t)) === 30)
  }

  test("user_survival_curve: KM recount with right-censoring") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val end = ev.map(_.getAs[java.sql.Date]("d").toLocalDate).max
    val lives = byUser.values.map { rs =>
      val ds = rs.map(_.getAs[java.sql.Date]("d").toLocalDate)
      val (first, last) = (ds.min, ds.max)
      val life = java.time.temporal.ChronoUnit.DAYS.between(first, last)
      val censored = java.time.temporal.ChronoUnit.DAYS.between(last, end) < 7
      (life, censored)
    }.toVector
    val days = lives.groupBy(_._1).toVector.sortBy(_._1)
    var sPpm = 1000000L
    val expected = days.map { case (d, ls) =>
      val nRisk = lives.count(_._1 >= d).toLong
      val churn = ls.count(!_._2).toLong
      sPpm = sPpm * (nRisk - churn) / nRisk
      (d, nRisk, churn, ls.size.toLong, churn * 1000000 / nRisk, sPpm)
    }
    val got = AnalyticsQueries.userSurvivalCurve(spark, dir).collect().map { r =>
      (r.getAs[Long]("day"), r.getAs[Long]("n_risk"), r.getAs[Long]("n_churn"),
        r.getAs[Long]("n_leaving"), r.getAs[Long]("hazard_ppm"),
        r.getAs[Long]("survival_ppm"))
    }.toVector
    assert(got === expected)
    // survival must be nonincreasing and the risk set telescopes
    assert(got.map(_._6) === got.map(_._6).sorted.reverse)
  }

  test("embedding_mutual_nn: an injective matching, mutual by recount") {
    val pairs = SimilarityQueries.embeddingMutualNn(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.nonEmpty)
    // mutual best-match is an injective partial matching: no vector can
    // appear twice on either side (a hub CAN be best-of-many, but it has
    // only one best itself — that is the point of the criterion)
    assert(pairs.map(_._1).distinct.length === pairs.length)
    assert(pairs.map(_._2).distinct.length === pairs.length)
    // recount: brute-force the within-bucket argmaxes from the raw vectors
    val emb = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    val planes = graft.functions.VectorFunctions.hyperplanes(nPlanes = 6, dim = 64)
    def bucket(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (h, j) =>
        if (h.zip(v).map { case (a, b) => a * b }.sum >= 0) 1L << j else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byBkt = emb.toVector.groupBy { case (id, v) => bucket(v) }
    val cands = byBkt.values.flatMap { vs =>
      val as = vs.filter(_._1 % 2 == 0); val bs = vs.filter(_._1 % 2 == 1)
      for { (ai, av) <- as; (bi, bv) <- bs } yield (ai, bi, cos(av, bv))
    }.toVector
    val bestA = cands.groupBy(_._1).map { case (a, cs) =>
      a -> cs.maxBy(c => (c._3, -c._2))._2 }
    val bestB = cands.groupBy(_._2).map { case (b, cs) =>
      b -> cs.maxBy(c => (c._3, -c._1))._1 }
    val expected = bestA.collect {
      case (a, b) if bestB(b) == a => (a, b) }.toSet
    assert(pairs.toSet === expected)
  }

  test("title_edit_dups: exact recount with a reference Levenshtein") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("title")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("title")))
    val capped = docs.groupBy(_._2.take(12)).values.flatMap(_.sortBy(_._1).take(40))
    val expected = (for {
      (ai, at) <- capped; (bi, bt) <- capped
      if ai < bi && at.take(12) == bt.take(12)
      d = lev(at, bt) if d <= 8
    } yield (ai, bi, d.toLong)).toSet
    val got = DedupQueries.titleEditDups(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("lev")))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("source_length_emd: recount off hand-built ECDFs") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val bySrc = docs.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted }
    val grid = docs.map(_._2).distinct.sorted
    def emd(a: Vector[Long], b: Vector[Long]): (BigInt, Long) = {
      val na = a.length.toLong; val nb = b.length.toLong
      var acc = BigInt(0)
      grid.zip(grid.drop(1)).foreach { case (v, nxt) =>
        val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
        acc += BigInt((ca * nb - cb * na).abs) * (nxt - v)
      }
      (acc, (acc * 1000000 / (BigInt(na) * nb)).toLong)
    }
    val got = PipelineQueries.sourceLengthEmd(spark, dir).collect()
    assert(got.length === bySrc.size * (bySrc.size - 1) / 2)
    got.foreach { r =>
      // emd_int is internal-only since r7 (DECIMAL output ban) — the
      // micro-scaled BIGINT is the full observable, recounted exactly
      val (_, em) = emd(bySrc(r.getAs[String]("source_a")).toVector,
        bySrc(r.getAs[String]("source_b")).toVector)
      assert(r.getAs[Long]("emd_micro") === em)
    }
  }

  test("customer_ldiversity: recount from the raw quasi-identifier classes") {
    val rows = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")).collect()
      .map(r => ((r.getAs[Int]("c_nationkey"),
        math.floor(r.getAs[Double]("c_acctbal") / 1000).toLong),
        r.getAs[String]("c_mktsegment")))
    val classes = rows.groupBy(_._1).map { case (_, ms) =>
      val segs = ms.map(_._2)
      (segs.distinct.length.toLong, segs.length.toLong,
        segs.groupBy(identity).values.map(_.length).max.toLong)
    }.toVector
    val expected = classes.groupBy(_._1).map { case (div, cs) =>
      (div, cs.length.toLong, cs.map(_._2).sum, cs.map(_._2).min,
        cs.map(c => c._3 * 1000000 / c._2).max,
        if (div < 3) cs.map(_._2).sum else 0L)
    }.toSet
    val got = PipelineQueries.customerLdiversity(spark, dir).collect().map { r =>
      (r.getAs[Long]("diversity"), r.getAs[Long]("n_classes"), r.getAs[Long]("n_records"),
        r.getAs[Long]("min_class"), r.getAs[Long]("worst_share_ppm"),
        r.getAs[Long]("n_records_at_risk"))
    }.toSet
    assert(got === expected)
  }

  test("part_local_clustering: corner credits sum to 3x the triangle census") {
    val local = AnalyticsQueries.partLocalClustering(spark, dir).collect()
    val global = AnalyticsQueries.partTriangles(spark, dir).collect().head
    assert(local.map(_.getAs[Long]("n_tri")).sum ===
      3 * global.getAs[Long]("n_triangles"))
    local.foreach { r =>
      val d = r.getAs[Long]("d"); val t = r.getAs[Long]("n_tri")
      assert(d >= 2)
      assert(t <= d * (d - 1) / 2, "triangles cannot exceed neighbor pairs")
      assert(r.getAs[Long]("lcc_ppm") === 2 * t * 1000000 / (d * (d - 1)))
    }
  }

  test("event_trigram_paths: recount the top consecutive triples") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val triples = ev.groupBy(_._1).toVector.flatMap { case (u, rs) =>
      rs.sortBy(_._2).map(_._3).sliding(3).filter(_.length == 3)
        .map(t => (u, (t(0), t(1), t(2)))).toVector
    }
    val expected = triples.groupBy(_._2).map { case (p, ts) =>
      (p, ts.length.toLong, ts.map(_._1).distinct.length.toLong)
    }.toVector
      .sortBy { case ((a, b, c), n, _) => (-n, a, b, c) }.take(20)
    val got = AnalyticsQueries.eventTrigramPaths(spark, dir).collect().map { r =>
      ((r.getAs[String]("e1"), r.getAs[String]("e2"), r.getAs[String]("e3")),
        r.getAs[Long]("n_paths"), r.getAs[Long]("n_users"))
    }.toVector
    assert(got === expected)
  }

  test("orders_bootstrap_ci: full mean is exact; interval is ordered") {
    val r = StatQueries.ordersBootstrapCi(spark, dir).collect().head
    val prices = Tables.orders(spark, dir).select(col("o_totalprice")).collect()
      .map(x => BigDecimal(x.getAs[Double]("o_totalprice"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val sumMicro = prices.map(_ * BigDecimal(1000000)).sum.toBigIntExact.get
    assert(r.getAs[Long]("n_full") === prices.length.toLong)
    assert(r.getAs[Long]("mean_full_micro") ===
      (sumMicro / prices.length).toLong)
    assert(r.getAs[Long]("n_reps") === 20L)
    assert(r.getAs[Long]("rep_lo_micro") <= r.getAs[Long]("rep_hi_micro"))
    assert(r.getAs[Long]("spread_micro") ===
      r.getAs[Long]("rep_hi_micro") - r.getAs[Long]("rep_lo_micro"))
  }

  test("orders_hill_tail: recount from a driver-side sort") {
    val prices = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (BigDecimal(r.getAs[Double]("o_totalprice"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP), r.getAs[Long]("o_orderkey")))
      .sortBy { case (p, k) => (-p, k) }
    val top = prices.take(101)
    val thr = top.map(_._1).min
    val sumLr = top.take(100).map { case (p, _) =>
      BigDecimal(math.log((p / thr).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val hill = (sumLr * BigDecimal(1000000)).toBigIntExact.get / 100
    val r = StatQueries.ordersHillTail(spark, dir).collect().head
    assert(r.getAs[Long]("k_top") === 100L)
    assert(r.getAs[Long]("thr_micro") ===
      (thr * BigDecimal(1000000)).toBigIntExact.get.toLong)
    assert(r.getAs[Long]("hill_micro") === hill.toLong)
    assert(r.getAs[Long]("alpha_micro") === (BigInt("1000000000000") / hill).toLong)
  }

  test("brier_decomposition: components are consistent") {
    val r = TextQueries.brierDecomposition(spark, dir).collect().head
    val o = r.getAs[Long]("o_bar_micro")
    assert(r.getAs[Long]("unc_micro2") === o * (1000000 - o))
    assert(r.getAs[Long]("rel_micro2") >= 0 && r.getAs[Long]("res_micro2") >= 0)
    // Murphy identity with a within-bin variance residual: the binned
    // decomposition understates the raw Brier by exactly the within-bin
    // spread (nonnegative), so brier ≥ rel − res + unc up to floor slack
    assert(r.getAs[Long]("brier_micro2") + 10 >=
      r.getAs[Long]("rel_micro2") - r.getAs[Long]("res_micro2")
        + r.getAs[Long]("unc_micro2"))
    // resolution can never exceed the outcome's own variance
    assert(r.getAs[Long]("res_micro2") <= r.getAs[Long]("unc_micro2") + 10)
  }

  test("referential_integrity_audit: recount every edge from raw key sets") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Option[Long]] =
      df.select(col(c).cast("long")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val c = Tables.customer(spark, dir); val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val edges = Map(
      "customer.nation" -> (keys(c, "c_nationkey"),
        keys(Tables.nation(spark, dir), "n_nationkey").flatten.toSet),
      "events.user" -> (keys(Tables.events(spark, dir), "user_id"),
        keys(c, "c_custkey").flatten.toSet),
      "lineitem.order" -> (keys(l, "l_orderkey"), keys(o, "o_orderkey").flatten.toSet),
      "lineitem.part" -> (keys(l, "l_partkey"),
        keys(Tables.part(spark, dir), "p_partkey").flatten.toSet),
      "lineitem.supplier" -> (keys(l, "l_suppkey"),
        keys(Tables.supplier(spark, dir), "s_suppkey").flatten.toSet),
      "orders.customer" -> (keys(o, "o_custkey"), keys(c, "c_custkey").flatten.toSet))
    val got = PipelineQueries.referentialIntegrityAudit(spark, dir).collect()
    assert(got.length === edges.size)
    got.foreach { r =>
      val (child, parents) = edges(r.getAs[String]("edge"))
      assert(r.getAs[Long]("n_child") === child.length.toLong)
      assert(r.getAs[Long]("n_null_keys") === child.count(_.isEmpty).toLong)
      assert(r.getAs[Long]("n_orphans") ===
        child.count(k => k.isDefined && !parents(k.get)).toLong)
    }
  }

  test("part_kcore: recount the peel; members have core degree >= 3 when converged") {
    // rebuild the >=2-joint-orders co-purchase edges from raw lineitem
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"))).toVector
    val allPairs = li.groupBy(_._1).values.toVector.flatMap { ps =>
      val ks = ps.map(_._2).distinct
      for (a <- ks; b <- ks if a < b) yield (a, b)
    }
    // .filter(...).keySet, NOT .collect { ... => tupleKey }: Map.collect
    // with a tuple result REBUILDS a Map and silently dedups by the
    // tuple's first element (188 of 2324 edges survived that bug)
    var edges: Set[(Long, Long)] =
      allPairs.groupBy(identity).filter(_._2.size >= 2).keySet.toSet
    var rounds = 0
    while (rounds < 12) {
      val deg = edges.toVector.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, vs) => v -> vs.size }
      val alive = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
      rounds += 1
    }
    val deg = edges.toVector.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val converged = deg.values.forall(_ >= 3)
    val got = AnalyticsQueries.partKcore(spark, dir).collect()
    assert(got.map(r => (r.getAs[Long]("part_id"), r.getAs[Long]("core_deg"))).toMap === deg)
    got.foreach { r =>
      assert(r.getAs[Boolean]("converged") === converged)
      if (converged) assert(r.getAs[Long]("core_deg") >= 3)
    }
  }

  test("token_textrank: exact recount of the damped iteration") {
    // rebuild adjacency from raw documents with the whitespace tokenizer
    val ws = " \t\n\r\f"
    val docs = Tables.documents(spark, dir).select(col("text")).collect()
      .map(_.getAs[String]("text"))
    val adj = docs.flatMap { text =>
      val trimmed = text.dropWhile(ws.contains(_)).reverse.dropWhile(ws.contains(_)).reverse
      val toks = if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
      toks.sliding(2).collect { case Array(a, b) if a != b => (a, b) }.toVector
    }
    val trans = (adj ++ adj.map(_.swap)).groupBy(identity)
      .map { case (e, es) => e -> es.length.toLong }
    val nodes = trans.keys.map(_._1).toVector.distinct.sorted
    val od = trans.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    var pr = nodes.map(n => n -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 4) {
      val contrib = trans.toVector.map { case ((s, d), c) =>
        d -> BigDecimal(pr(s) * (c.toDouble / od(s)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.groupBy(_._1).map { case (d, ts) => d -> ts.map(_._2).sum.toDouble }
      pr = nodes.map(n =>
        n -> (0.15 / nodes.size + 0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    val got = CorpusQueries.tokenTextrank(spark, dir).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Double]("textrank")).toMap
    assert(got.keySet === pr.keySet)
    pr.foreach { case (n, v) =>
      assert(got(n) === BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"textrank mismatch at $n")
    }
    // stochastic graph with no dangling nodes: mass is conserved
    assert(math.abs(got.values.sum - 1.0) < 0.02)
  }

  test("attribution_markov_removal: exact recount; removal never adds reach") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rs =>
      val path0 = rs.sortBy(_._2).map(_._3).toVector
      val cut = path0.indexOf("purchase")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      ("start" +: path).sliding(2).foreach { case Seq(a, b) => trans((a, b)) += 1 }
      if (cut < 0) trans((path.last, "drop")) += 1
    }
    val od = trans.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    def reach(removed: Option[String]): Double = {
      val edges = trans.toVector.collect {
        case ((s, d), c) if !removed.contains(s) && !removed.contains(d) =>
          (s, d, c.toDouble / od(s))
      }
      var r = Map("purchase" -> 1.0).withDefaultValue(0.0)
      for (_ <- 1 to 8) {
        val acc = edges.map { case (s, d, w) =>
          s -> BigDecimal(w * r(d)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.groupBy(_._1).map { case (s, ts) => s -> ts.map(_._2).sum.toDouble }
        r = (acc - "purchase" - "drop").withDefaultValue(0.0) + ("purchase" -> 1.0)
      }
      r("start")
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = reach(None)
    val got = AnalyticsQueries.attributionMarkovRemoval(spark, dir).collect()
    assert(got.length === 4)
    got.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(r.getAs[Double]("base_reach") === r6(base), s"base at $c")
      assert(r.getAs[Double]("removed_reach") === r6(reach(Some(c))), s"removed at $c")
      // deleting a state can only delete conversion paths, never add them
      assert(r.getAs[Double]("removal_effect") >= -1e-6)
    }
  }

  test("unigram_lm_segment: Viterbi recount from first principles") {
    val ws = " \t\n\r\f"
    val words = Tables.documents(spark, dir).select(col("text")).collect()
      .flatMap { r =>
        val t = r.getAs[String]("text")
        val trimmed = t.dropWhile(ws.contains(_)).reverse.dropWhile(ws.contains(_)).reverse
        if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
      }
      .filter(_.matches("^[a-z]{1,8}$"))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    // piece vocabulary: top-40 substrings by weighted count + all chars
    val sub = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    words.foreach { case (w, f) =>
      for (k <- 1 to math.min(4, w.length); i <- 0 to w.length - k)
        sub(w.substring(i, i + k)) += f
    }
    val top = sub.toVector.sortBy { case (p, f) => (-f, p) }.take(40).map(_._1).toSet
    val vocab = sub.filter { case (p, _) => top(p) || p.length == 1 }
    val tot = vocab.values.sum
    val score = vocab.map { case (p, f) =>
      p -> BigDecimal(math.log(f.toDouble / tot) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // exact integer Viterbi with (score, fewest pieces, lexicographic seg) ties
    def segment(w: String): (Long, Int, String) = {
      val best = Array.fill[Option[(Long, Int, String)]](w.length + 1)(None)
      best(0) = Some((0L, 0, ""))
      for (j <- 1 to w.length; k <- 1 to math.min(4, j); prev <- best(j - k)) {
        val piece = w.substring(j - k, j)
        score.get(piece).foreach { s =>
          val cand = (prev._1 + s, prev._2 + 1, prev._3 + "|" + piece)
          val better = best(j).forall { cur =>
            val key = (c: (Long, Int, String)) =>
              f"${c._1 + 500000000L}%09d" + f"${99 - c._2}%02d" + c._3
            key(cand) > key(cur)
          }
          if (better) best(j) = Some(cand)
        }
      }
      val r = best(w.length).get
      (r._1, r._2, r._3.drop(1))
    }
    val got = CorpusQueries.unigramLmSegment(spark, dir).collect()
    assert(got.length === words.size)
    got.foreach { r =>
      val w = r.getAs[String]("word")
      val (lp, np, seg) = segment(w)
      assert(r.getAs[Long]("freq") === words(w))
      assert(r.getAs[Long]("logp_micro") === lp, s"logp at $w")
      assert(r.getAs[Int]("n_pieces") === np, s"n_pieces at $w")
      assert(r.getAs[String]("segmentation") === seg, s"seg at $w")
    }
    // EM counts re-aggregate the segmentations exactly
    val em = CorpusQueries.unigramEmCounts(spark, dir).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("em_count"))).toMap
    val expectedEm = words.toVector.flatMap { case (w, f) =>
      segment(w)._3.split("\\|").toVector.map(_ -> f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(em === expectedEm)
  }

  test("event_lateness_profile: recount under the simulated transport") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us")))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val expected = ev.groupBy(_._1).map { case (sid, rs) =>
      val arr = rs.map { case (_, id, us) =>
        (us + (h60(id.toString) % 3600000L) * 1000, id, us)
      }.sortBy(a => (a._1, a._2))
      var mx = Long.MinValue
      val lates = arr.map { case (_, _, us) =>
        mx = math.max(mx, us); (mx - us) / 1000
      }
      def q(p: Int): Long = {
        val k = ((lates.length.toLong * p + 99) / 100).toInt
        lates.sorted.apply(k - 1)
      }
      sid -> (lates.length.toLong, lates.count(_ > 0).toLong, lates.max,
        q(50), q(95), q(99))
    }
    val got = TimeSeriesQueries.eventLatenessProfile(spark, dir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected(r.getAs[String]("sensor_id"))
      assert((r.getAs[Long]("n"), r.getAs[Long]("n_late"), r.getAs[Long]("max_late_ms"),
        r.getAs[Long]("p50_ms"), r.getAs[Long]("p95_ms"), r.getAs[Long]("p99_ms")) === e)
    }
  }

  test("shuffle_runs_test: recount off the shuffle's own output") {
    val order = PipelineQueries.corpusShuffle(spark, dir).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"), r.getAs[Long]("doc_id")))
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val got = PipelineQueries.shuffleRunsTest(spark, dir).collect()
    val byShard = order.groupBy(_._1)
    assert(got.length === byShard.size)
    got.foreach { r =>
      val sh = r.getAs[Int]("shard")
      val seq = byShard(sh).sortBy(_._2).map(t => src(t._3)).toVector
      val same = seq.zip(seq.tail).count { case (a, b) => a == b }.toLong
      val pairs2 = seq.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      assert(r.getAs[Long]("n") === seq.length.toLong)
      assert(r.getAs[Long]("n_adjacent") === seq.length.toLong - 1)
      assert(r.getAs[Long]("same_adjacent") === same)
      assert(r.getAs[Long]("expected_micro") === pairs2 * 1000000 / seq.length)
      if (pairs2 > 0)
        assert(r.getAs[Long]("ratio_micro") === same * seq.length * 1000000 / pairs2)
    }
  }

  test("sensor_burstiness: recount over an explicit zero-filled grid") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("minute", col("ts")).as("m")).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("m").getTime))
    val expected = ev.groupBy(_._1).map { case (sid, rs) =>
      val counts = rs.groupBy(_._2).map { case (m, xs) => m -> xs.length.toLong }
      val (lo, hi) = (counts.keys.min, counts.keys.max)
      val n = (hi - lo) / 60000 + 1
      // the naive way: materialize every grid minute including zeros
      val grid = (0L until n).map(i => counts.getOrElse(lo + i * 60000, 0L))
      val s = grid.sum; val q = grid.map(c => BigInt(c) * c).sum
      val disp = (BigInt(n) * q - BigInt(s) * s) * 1000000 / (BigInt(n - 1) * s)
      sid -> (s, n, counts.size.toLong, disp.toLong)
    }
    val got = TimeSeriesQueries.sensorBurstiness(spark, dir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      assert((r.getAs[Long]("n_events"), r.getAs[Long]("span_minutes"),
        r.getAs[Long]("observed_minutes"), r.getAs[Long]("dispersion_micro")) ===
        expected(r.getAs[String]("sensor_id")))
    }
  }

  test("part_assortativity: recount from raw degrees; bounded in [-1, 1]") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"))).toVector
    val allPairs = li.groupBy(_._1).values.toVector.flatMap { ps =>
      val ks = ps.map(_._2).distinct
      for (a <- ks; b <- ks if a < b) yield (a, b)
    }
    val edges = allPairs.groupBy(identity).filter(_._2.size >= 2).keySet.toVector
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val sym = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = BigInt(sym.length)
    val sx = sym.map(p => BigInt(p._1)).sum
    val sxx = sym.map(p => BigInt(p._1) * p._1).sum
    val sxy = sym.map(p => BigInt(p._1) * p._2).sum
    val expected = (m * sxy - sx * sx) * 1000000 / (m * sxx - sx * sx)
    val r = AnalyticsQueries.partAssortativity(spark, dir).collect().head
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    val a = r.getAs[Long]("assortativity_micro")
    assert(a === expected.toLong)
    assert(a >= -1000000 && a <= 1000000)
  }

  test("cem_att_estimate: recount matching, pruning and the weighted ATT") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), to_date(col("ts")).as("d"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d")))
    val users = ev.groupBy(_._1).values.map { rs =>
      val treated = rs.minBy(_._2)._3 == "signup"
      val purchases = rs.count(_._3 == "purchase").toLong
      val eb = rs.length / 10
      val db = rs.map(_._4).distinct.length / 5
      ((eb, db), treated, purchases)
    }.toVector
    val strata = users.groupBy(_._1).values.map { us =>
      val (t, c) = us.partition(_._2)
      (t.length.toLong, c.length.toLong, t.map(_._3).sum, c.map(_._3).sum)
    }.toVector
    val matched = strata.filter(s => s._1 > 0 && s._2 > 0)
    val att = matched.map { case (nt, nc, pt, pc) =>
      nt * (pt * 1000000 / nt - pc * 1000000 / nc)
    }.sum / matched.map(_._1).sum
    val r = ExperimentQueries.cemAttEstimate(spark, dir).collect().head
    assert(r.getAs[Long]("n_strata_matched") === matched.length.toLong)
    assert(r.getAs[Long]("n_treated_matched") === matched.map(_._1).sum)
    assert(r.getAs[Long]("n_control_matched") === matched.map(_._2).sum)
    assert(r.getAs[Long]("n_treated_pruned") ===
      strata.filter(s => s._1 == 0 || s._2 == 0).map(_._1).sum)
    assert(r.getAs[Long]("att_micro") === att)
  }

  test("orders_did_estimate: the DiD identity holds over its own cells") {
    val r = ExperimentQueries.ordersDidEstimate(spark, dir).collect().head
    assert(r.getAs[Long]("did_micro") ===
      (r.getAs[Long]("mean_t_post_micro") - r.getAs[Long]("mean_t_pre_micro"))
        - (r.getAs[Long]("mean_c_post_micro") - r.getAs[Long]("mean_c_pre_micro")))
    Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .foreach(c => assert(r.getAs[Long](c) > 0, s"empty cell $c"))
  }

  test("ab_sprt_daily: the walk telescopes and the decision is the boundary") {
    val rows = ExperimentQueries.abSprtDaily(spark, dir).collect()
    assert(rows.nonEmpty)
    var cum = 0L
    var decided = false
    rows.foreach { r =>
      cum += r.getAs[Long]("llr_inc_micro")
      assert(r.getAs[Long]("llr_cum_micro") === cum)
      val d = r.getAs[String]("decision")
      val upper = math.round(math.log(0.95 / 0.05) * 1e6)
      val lower = math.round(math.log(0.05 / 0.95) * 1e6)
      if (cum >= upper) assert(d === "reject_h0")
      else if (cum <= lower) assert(d === "accept_h0")
      else assert(d === "continue")
      if (r.getAs[Boolean]("is_decision_day")) {
        assert(!decided, "only the first crossing is flagged")
        assert(d !== "continue")
        decided = true
      }
    }
  }

  test("score_conformal_threshold: ranks and coverage accounting hold") {
    val rows = TextQueries.scoreConformalThreshold(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nCal = r.getAs[Long]("n_cal")
      assert(r.getAs[Long]("k_rank") === ((nCal + 1) * 9 + 9) / 10)
      val q = r.getAs[Long]("q_micro")
      assert(q >= 0 && q <= 1000000)
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
      assert(r.getAs[Long]("coverage_ppm") ===
        r.getAs[Long]("n_covered") * 1000000 / r.getAs[Long]("n_test"))
    }
    // pooled across sources, the 90% marginal guarantee should hold with
    // slack for per-source finite-sample wobble
    val cov = rows.map(r => (r.getAs[Long]("n_covered"), r.getAs[Long]("n_test")))
    val pooled = cov.map(_._1).sum.toDouble / cov.map(_._2).sum
    assert(pooled >= 0.80, s"pooled conformal coverage $pooled below slack bound")
  }
}
