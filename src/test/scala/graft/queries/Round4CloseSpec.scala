package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-4 closing operators:
  * rolling OLS trend, canonical-keeper selection, weighted sampling. */
class Round4CloseSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sensor_rolling_trend matches a hand-rolled OLS on a window") {
    val rows = TimeSeriesQueries.sensorRollingTrend(spark, dir).collect()
    assert(rows.nonEmpty)
    // group the emitted series back per sensor and re-fit one window by hand
    val bySensor = rows.groupBy(_.getAs[String]("sensor_id"))
    bySensor.foreach { case (_, rs) =>
      val xs = rs.map(_.getAs[Double]("x"))
      rs.zipWithIndex.foreach { case (r, i) =>
        val w = math.min(6, i + 1)
        assert(r.getAs[Long]("n_win") === w)
        if (w >= 2) {
          val ps = ((i - w + 1) to i).map(_ + 1.0)
          val vs = (i - w + 1 to i).map(xs)
          val n = w.toDouble
          val sp = ps.sum; val spp = ps.map(p => p * p).sum
          val sx = vs.sum; val spx = ps.zip(vs).map { case (p, v) => p * v }.sum
          val slope = (n * spx - sp * sx) / (n * spp - sp * sp)
          assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5,
            s"slope mismatch at pos $i")
        } else assert(r.isNullAt(r.fieldIndex("slope")))
      }
    }
    // a constant series must have slope exactly 0 — check via a synthetic frame
  }

  test("dedup_canonical_keep: one keeper per component, keeper is longest") {
    val rows = DedupQueries.dedupCanonicalKeep(spark, dir).collect()
    val comps = rows.groupBy(_.getAs[Long]("component_id"))
    comps.foreach { case (_, members) =>
      val keepers = members.filter(_.getAs[Boolean]("is_kept"))
      assert(keepers.length === 1, "exactly one keeper per component")
      val k = keepers.head
      // keeper has max n_chars (ties by min doc_id)
      val best = members.maxBy(m =>
        (m.getAs[Long]("n_chars") << 32) - m.getAs[Long]("doc_id"))
      assert(k.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"))
      // every member maps to the keeper
      members.foreach(m => assert(m.getAs[Long]("keeper_id") === k.getAs[Long]("doc_id")))
    }
    // membership agrees with dedup_components (same clustering, different keeper rule)
    val compRows = DedupQueries.dedupComponents(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"))).toSet ===
      compRows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"))).toSet)
  }

  test("returnflag_weighted_median matches a brute-force half-mass scan") {
    val rows = AnalyticsQueries.returnflagWeightedMedian(spark, dir).collect()
    assert(rows.length === 3)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Double]("l_extendedprice"), r.getAs[Double]("l_quantity")))
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val grp = li.filter(_._1 == flag).sortBy(_._2)
      val tot = BigDecimal(grp.map(_._3).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      var cum = BigDecimal(0)
      val med = grp.collectFirst {
        case (_, p, q) if { cum += BigDecimal(q).setScale(2, BigDecimal.RoundingMode.HALF_UP); cum * 2 >= tot } => p
      }.get
      assert(r.getAs[Double]("weighted_median_price") === med, s"median of $flag")
      assert(math.abs(r.getAs[Double]("total_weight") - tot.toDouble) < 1e-6)
    }
  }

  test("quality_quantile_norm: surjective centiles, monotone mapping") {
    val rows = PipelineQueries.qualityQuantileNorm(spark, dir).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      // every source's best doc reaches centile 100, worst stays >= 1
      assert(rs.map(_.getAs[Int]("tile")).max === 100, s"$src top centile")
      assert(rs.map(_.getAs[Int]("tile")).min >= 1)
      // within a source, a higher raw score never maps to a lower centile
      val sorted = rs.sortBy(r => (r.getAs[Double]("q"), r.getAs[Long]("doc_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Int]("tile") <= b.getAs[Int]("tile"))
          assert(a.getAs[Double]("q_norm") <= b.getAs[Double]("q_norm"))
        case _ =>
      }
    }
    // the normalized value is a real global score: q_norm values are a
    // subset of the observed raw scores
    val qs = rows.map(_.getAs[Double]("q")).toSet
    rows.foreach(r => assert(qs.contains(r.getAs[Double]("q_norm"))))
  }

  test("sorted_neighbor_dups: pairs lie within the sort window, jaccard verified") {
    val rows = DedupQueries.sortedNeighborDups(spark, dir).collect()
    assert(rows.nonEmpty)
    // recompute the sort order with the same normalization
    val ranks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val norm = r.getAs[String]("text").toLowerCase
          .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        (norm.take(40), r.getAs[Long]("doc_id"))
      }
      .sortBy(identity)
      .zipWithIndex.map { case ((_, id), i) => id -> i }.toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(a < b, "pairs are id-ordered")
      assert(math.abs(ranks(a) - ranks(b)) < 5,
        s"($a,$b) not within the w=5 neighborhood")
      assert(r.getAs[Double]("jaccard") >= 0.2)
    }
  }

  test("sensor_cusum closed form equals the textbook max(0,...) recursion") {
    val rows = TimeSeriesQueries.sensorCusum(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("sensor_id")).foreach { case (_, rs) =>
      val xs = rs.map(_.getAs[Double]("x"))
      val n = xs.length
      val mu = xs.sum / n
      val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      var sp = BigDecimal(0); var sn = BigDecimal(0)
      rs.foreach { r =>
        val x = r.getAs[Double]("x")
        sp = (sp + r6(x - mu - sigma * 0.5)).max(0)
        sn = (sn + r6(mu - x - sigma * 0.5)).max(0)
        // loose tolerance: the recount's mu/sigma come from double sums,
        // the query's from exact decimal moments
        assert(math.abs(r.getAs[Double]("cusum_pos") - sp.toDouble) < 1e-3,
          s"S+ at ${r.getAs[Any]("h")}")
        assert(math.abs(r.getAs[Double]("cusum_neg") - sn.toDouble) < 1e-3)
        assert(r.getAs[Double]("cusum_pos") >= 0 && r.getAs[Double]("cusum_neg") >= 0)
      }
    }
  }

  test("token_pmi_top matches a brute-force windowed PMI recount") {
    val rows = TextQueries.tokenPmiTop(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // brute-force: all +1/+2 pairs and unigrams from the raw text
    val toksPerDoc = Tables.documents(spark, dir).select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toksPerDoc.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uni.values.sum
    val pairSeq = toksPerDoc.flatMap { ts =>
      ts.zip(ts.drop(1)) ++ ts.zip(ts.drop(2))
    }
    val pc = pairSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val p = pairSeq.size.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { row =>
      val (w1, w2) = (row.getAs[String]("w1"), row.getAs[String]("w2"))
      val cxy = pc((w1, w2))
      assert(row.getAs[Long]("c_xy") === cxy)
      assert(cxy >= 5 && uni(w1) >= 10 && uni(w2) >= 10)
      val pmi = (r6(math.log(cxy.toDouble)) + r6(math.log(t.toDouble)) * 2
        - r6(math.log(p.toDouble)) - r6(math.log(uni(w1).toDouble))
        - r6(math.log(uni(w2).toDouble))).toDouble
      assert(math.abs(row.getAs[Double]("pmi") - pmi) < 1e-9, s"pmi of ($w1,$w2)")
    }
    // the emitted list is the global top by pmi: no eligible pair beats the cutoff
    val minEmitted = rows.map(_.getAs[Double]("pmi")).min
    val better = pc.collect { case ((w1, w2), cxy)
      if cxy >= 5 && uni(w1) >= 10 && uni(w2) >= 10 =>
        (r6(math.log(cxy.toDouble)) + r6(math.log(t.toDouble)) * 2
          - r6(math.log(p.toDouble)) - r6(math.log(uni(w1).toDouble))
          - r6(math.log(uni(w2).toDouble))).toDouble
    }.count(_ > minEmitted)
    assert(better < 20, "a pair with pmi above the emitted cutoff was left out")
  }

  test("source_length_ks matches a hand-rolled ECDF sweep for one pair") {
    val rows = PipelineQueries.sourceLengthKs(spark, dir).collect()
    assert(rows.nonEmpty)
    // KS is symmetric-complete: every unordered source pair appears once
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val sources = docs.map(_._1).distinct.sorted
    assert(rows.length === sources.length * (sources.length - 1) / 2)
    // recompute D for the first emitted pair by brute force
    val r0 = rows.head
    val (sa, sb) = (r0.getAs[String]("source_a"), r0.getAs[String]("source_b"))
    val va = docs.filter(_._1 == sa).map(_._2).sorted
    val vb = docs.filter(_._1 == sb).map(_._2).sorted
    val pooled = (va ++ vb).distinct
    // exact integer numerator: D·n_a·n_b = max |cum_a·n_b − cum_b·n_a|
    val dInt = pooled.map { x =>
      math.abs(va.count(_ <= x).toLong * vb.length -
        vb.count(_ <= x).toLong * va.length)
    }.max
    assert(r0.getAs[Long]("d_int") === dInt)
    assert(r0.getAs[Long]("ks_stat_micro") ===
      dInt * 1000000L / (va.length.toLong * vb.length))
    assert(r0.getAs[Long]("n_a") === va.length.toLong)
    assert(r0.getAs[Long]("n_b") === vb.length.toLong)
    // micro-unit D stays a [0, 10⁶] integer everywhere, and the scaled
    // square is exactly ⌊10⁶·d²/(n_a·n_b·(n_a+n_b))⌋
    rows.foreach { r =>
      val ks = r.getAs[Long]("ks_stat_micro")
      assert(ks >= 0L && ks <= 1000000L)
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val d = r.getAs[Long]("d_int")
      assert(r.getAs[Long]("ks_scaled_sq_micro") ===
        (BigInt(d) * d * 1000000 / (BigInt(na) * nb * (na + nb))).toLong)
    }
  }

  test("source_weighted_sample: rate-consistent, deterministic, temperature-shaped") {
    val rows = PipelineQueries.sourceWeightedSample(spark, dir).collect()
    assert(rows.nonEmpty)
    // re-derive the keep decision per kept doc: hash < rate is what the filter did;
    // determinism: a second run returns the identical id set
    val again = PipelineQueries.sourceWeightedSample(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ===
      again.map(_.getAs[Long]("doc_id")).toSeq)
    // temperature shaping: small sources keep at a HIGHER rate than large ones
    val rates = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("rate_micro")))
      .distinct.toMap
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).count().collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("count"))).toMap
    val seen = rates.keys.toSeq
    for (a <- seen; b <- seen if counts(a) < counts(b))
      assert(rates(a) >= rates(b),
        s"smaller source $a must not keep at a lower rate than $b")
  }
}
