package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** First-principles checks for the round-6 governance/evaluation trio:
  * deletion_propagation (recounted with independent in-memory joins),
  * classifier_calibration (bins partition the scored docs; ECE recomputed
  * from per-doc output), lsh_tuning_report (banding theory invariants:
  * candidates and recall monotone in rows-per-band, hits bounded). */
class GovernanceTuningSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("deletion_propagation matches an independent recount") {
    val del = graft.sources.Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0)).filter(_ % 97 == 0).toSet
    val orders = graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delOrders = orders.filter(o => del(o._2)).map(_._1).toSet
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey").collect().map(_.getLong(0))
    val ev = graft.sources.Tables.events(spark, dir)
      .select("user_id").collect().map(_.getLong(0))
    val nCust = graft.sources.Tables.customer(spark, dir).count()

    val expected = Seq(
      ("customer", nCust, del.size.toLong),
      ("events", ev.length.toLong, ev.count(del).toLong),
      ("lineitem", li.length.toLong, li.count(delOrders).toLong),
      ("orders", orders.length.toLong, delOrders.size.toLong))
      .map { case (t, n, d) =>
        (t, n, d, n - d, Math.floorDiv(d * 1000000L, n)) }

    val got = PipelineQueries.deletionPropagation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected)
    assert(expected.exists(_._3 > 0), "tombstone list reaches nothing — vacuous")
  }

  test("classifier_calibration bins partition the scored docs and recover ECE") {
    val perDoc = TextQueries.docClassifierScore(spark, dir)
      .select("doc_id", "prob").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val labels = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), if (r.getLong(1) >= 300) 1L else 0L)).toMap

    val bins = perDoc.groupBy { case (_, p) => Math.min(Math.floor(p * 10).toLong, 9L) }
    val expected = bins.map { case (b, docs) =>
      val n = docs.length.toLong
      val pos = docs.map(d => labels(d._1)).sum
      // prob is exactly 6-decimal; micro-sum is exact integer arithmetic
      val sumMicro = docs.map(d => Math.round(d._2 * 1e6)).sum
      val conf = Math.floorDiv(sumMicro, n)
      val acc = Math.floorDiv(pos * 1000000L, n)
      (b, n, pos, conf, acc, Math.abs(conf - acc))
    }.toSeq.sortBy(_._1)

    val got = TextQueries.classifierCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === perDoc.length.toLong, "bins don't partition the docs")
    // ECE is recoverable: Σ n_b·gap_b / N — just assert it's finite & sane
    val ece = got.map(g => g._2 * g._6).sum / got.map(_._2).sum
    assert(ece >= 0 && ece <= 1000000)
  }

  test("lsh_tuning_report obeys banding theory (sampled registered + full baseline)") {
    // the registered entry runs on the deterministic 25% md5 sample (the
    // production shape); the full-corpus form is the spec-only baseline —
    // banding theory must hold on BOTH, and the sample can only shrink
    // the exact ground-truth pair set
    val forms = Seq(
      "sampled" -> DedupQueries.lshTuningReport(spark, dir),
      "full" -> DedupQueries.lshTuningReportFull(spark, dir))
    val byForm = forms.map { case (label, df) =>
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 6L), label)
      rows.foreach { r =>
        assert(r._1 * r._2 === 12L, s"$label: bands × rows must use the whole signature")
        assert(r._5 <= math.min(r._3, r._4),
          s"$label: hits exceed candidates/exact at r=${r._1}")
        assert(r._6 <= 1000000L && r._7 <= 1000000L)
      }
      // coarser bands (larger r) can only shrink the candidate set and
      // recall WHEN every coarse band contains a complete finer band
      // (true for 1→2, 2→3, 4→6 here; NOT for 3→4, whose band [4..7]
      // spans the r=3 boundary — that step is excluded)
      rows.sliding(2).foreach { case Array(a, b) =>
        if (!(a._1 == 3L && b._1 == 4L)) {
          assert(b._3 <= a._3, s"$label: candidates grew from r=${a._1} to r=${b._1}")
          assert(b._6 <= a._6, s"$label: recall grew from r=${a._1} to r=${b._1}")
        }
      }
      assert(rows.head._3 > rows.last._3, s"$label: sweep is flat — vacuous fixture")
      label -> rows
    }.toMap
    // the sample is a strict subset of the corpus: per leg, every count
    // is bounded by the full form's
    byForm("sampled").zip(byForm("full")).foreach { case (s, f) =>
      assert(s._3 <= f._3 && s._4 <= f._4 && s._5 <= f._5,
        s"sampled counts exceed full-corpus counts at r=${s._1}")
    }
    assert(byForm("sampled").map(_._4).sum > 0,
      "25% sample carries no exact pairs — tuning signal vacuous at this SF")
  }
}
