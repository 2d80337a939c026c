package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Unit behavior of the cross-round plan-diff gate: parsing of the
  * artifact line format (including pre-r11 lines without
  * materialize_points), regression classification per field, and the
  * whitelist plumbing. The artifact-level tests in `RegistryAuditSpec`
  * prove currency; this one proves the gate MEASURES what it claims. */
class PlanDiffSpec extends AnyFunSuite {

  private def line(
      query: String = "q",
      shuffle: Int = 2,
      broadcast: Int = 1,
      joins: String = """"BroadcastHashJoin":1""",
      sorts: Int = 1,
      windows: Int = 0,
      mat: Option[Int] = Some(1),
      scans: String = """{"table":"documents.parquet","pushed":2,"cols":3}""") = {
    val m = mat.fold("")(v => s""""materialize_points":$v,""")
    s"""{"query":"$query","shuffle_exchanges":$shuffle,""" +
      s""""broadcast_exchanges":$broadcast,"joins":{$joins},""" +
      s""""sorts":$sorts,"windows":$windows,$m"scans":[$scans]}"""
  }

  test("parses the writer format, with and without materialize_points") {
    val l = PlanDiff.parseLine(line())
    assert(l.query === "q" && l.shuffle === 2 && l.broadcast === 1)
    assert(l.joins === Map("BroadcastHashJoin" -> 1))
    assert(l.sorts === 1 && l.windows === 0)
    assert(l.materializePoints === Some(1))
    assert(l.pushedTotal === 2)
    val pre = PlanDiff.parseLine(line(mat = None))
    assert(pre.materializePoints === None)
  }

  test("round-trips a real digest through toJsonLine") {
    val d = PlanDigest.Digest(3, 2, Seq("SortMergeJoin" -> 2), 4, 1,
      Seq(PlanDigest.ScanInfo("orders.parquet", 2, 5),
        PlanDigest.ScanInfo("lineitem.parquet", 1, 3, kind = "materialized"),
        PlanDigest.ScanInfo("lineitem.parquet", 1, 3, kind = "lineage")), 2)
    val l = PlanDiff.parseLine(PlanDigest.toJsonLine("rt", d))
    assert(l.shuffle === 3 && l.broadcast === 2 && l.sorts === 4
      && l.windows === 1)
    assert(l.joins === Map("SortMergeJoin" -> 2))
    assert(l.materializePoints === Some(2))
    assert(l.pushedTotal === 4,
      "every scan kind participates in the gated pushed total")
  }

  test("pushdown gate covers every scan kind (r14, retiring base-only)") {
    def tagged(basePushed: Int, matPushed: Int, linPushed: Int) =
      PlanDiff.parseLine(line(
        scans = s"""{"table":"orders.parquet","pushed":$basePushed,"cols":5,"kind":"base"},""" +
          s"""{"table":"documents.parquet","pushed":$matPushed,"cols":3,"kind":"materialized"},""" +
          s"""{"table":"documents.parquet","pushed":$linPushed,"cols":3,"kind":"lineage"}"""))
    // a pushed count lost on the MATERIALIZED scan — the checkpoint
    // build's one real runtime read — gates (the r13 base-only form
    // let it pass as an informational scans change)
    val matLoss = PlanDiff.diffQuery(tagged(2, 3, 3), tagged(2, 0, 3))
    assert(matLoss.exists(c => c.field == "pushed_filters_total" && c.regression),
      s"materialized-scan pushed loss must gate: $matLoss")
    // a loss on a lineage copy also gates (over-strict by design:
    // lineage moves in lockstep with its subtree, and a genuine base
    // scan colliding with a materialized signature is at worst tagged
    // lineage — the r13 under-gate ADVICE named)
    val linLoss = PlanDiff.diffQuery(tagged(2, 3, 3), tagged(2, 3, 1))
    assert(linLoss.exists(c => c.field == "pushed_filters_total" && c.regression))
    // base loss gates as always
    val baseLoss = PlanDiff.diffQuery(tagged(2, 3, 3), tagged(1, 3, 3))
    assert(baseLoss.exists(c => c.field == "pushed_filters_total" && c.regression))
    // format boundary: an untagged (pre-r13) line vs its tagged rendering
    // with identical scans diffs to NOTHING — kind is normalized out of
    // scansRaw and the pushed total compares equal
    val untagged = PlanDiff.parseLine(line(
      scans = """{"table":"documents.parquet","pushed":2,"cols":3}"""))
    val nowTagged = PlanDiff.parseLine(line(
      scans = """{"table":"documents.parquet","pushed":2,"cols":3,"kind":"base"}"""))
    assert(PlanDiff.diffQuery(untagged, nowTagged).isEmpty)
    // ...and a genuine pushed loss across the boundary still gates
    val crossLoss = PlanDiff.diffQuery(untagged, PlanDiff.parseLine(line(
      scans = """{"table":"documents.parquet","pushed":1,"cols":3,"kind":"base"}""")))
    assert(crossLoss.exists(c => c.field == "pushed_filters_total" && c.regression))
  }

  test("refuses a scans string the scan-object regex cannot fully parse") {
    // a table name with an escaped quote slips past ScanObjRe while
    // PushedRe still counts its pushed field — pre-r14 the line parsed
    // with a silently lower scan-object count; now it fails loudly
    val drifted = line(scans =
      """{"table":"docs\"x.parquet","pushed":2,"cols":3,"kind":"base"}""")
    val e = intercept[RuntimeException](PlanDiff.parseLine(drifted))
    assert(e.getMessage.contains("scan-object parse mismatch"), e.getMessage)
  }

  test("classifies regressions: exchange creep, join flip, lost pushdown") {
    val prev = PlanDiff.parseLine(line())
    // shuffle increase = regression
    val moreShuffle = PlanDiff.diffQuery(prev, PlanDiff.parseLine(line(shuffle = 3)))
    assert(moreShuffle.exists(c => c.field == "shuffle_exchanges" && c.regression))
    // shuffle DECREASE is a change but not a regression
    val lessShuffle = PlanDiff.diffQuery(prev, PlanDiff.parseLine(line(shuffle = 1)))
    assert(lessShuffle.exists(c => c.field == "shuffle_exchanges" && !c.regression))
    // any join-strategy change = regression (needs review)
    val flip = PlanDiff.diffQuery(prev,
      PlanDiff.parseLine(line(joins = """"SortMergeJoin":1""")))
    assert(flip.exists(c => c.field == "joins" && c.regression))
    // lost pushed filter = regression
    val lost = PlanDiff.diffQuery(prev, PlanDiff.parseLine(line(
      scans = """{"table":"documents.parquet","pushed":1,"cols":3}""")))
    assert(lost.exists(c => c.field == "pushed_filters_total" && c.regression))
    // materialize_points drift is informational
    val mat = PlanDiff.diffQuery(prev, PlanDiff.parseLine(line(mat = Some(4))))
    assert(mat.exists(c => c.field == "materialize_points" && !c.regression))
    // …and not comparable when the previous round didn't record it
    assert(PlanDiff.diffQuery(PlanDiff.parseLine(line(mat = None)),
      PlanDiff.parseLine(line(mat = Some(4)))).isEmpty)
    // identical lines diff to nothing
    assert(PlanDiff.diffQuery(prev, PlanDiff.parseLine(line())).isEmpty)
  }

  test("report: added/removed sets, whitelist gating, json rendering") {
    val prev = Map(
      "a" -> PlanDiff.parseLine(line(query = "a")),
      "b" -> PlanDiff.parseLine(line(query = "b")))
    val cur = Map(
      "a" -> PlanDiff.parseLine(line(query = "a", shuffle = 5)),
      "c" -> PlanDiff.parseLine(line(query = "c")))
    val r = PlanDiff.diff(prev, cur)
    assert(r.added === Seq("c") && r.removed === Seq("b"))
    assert(r.changed.map(_.query) === Seq("a"))
    assert(r.unexplained.map(_.query) === Seq("a"),
      "a regression without a whitelist entry must surface as unexplained")
    val json = PlanDiff.toJson(r)
    assert(json.contains(""""unexplained_regressions":["a"]"""))
    assert(json.contains(""""added":["c"]""") && json.contains(""""removed":["b"]"""))
    // whitelisted diffs render the reason and drop out of unexplained
    val wl = r.changed.map(d => d.copy(whitelisted = Some("intentional rework")))
    val explained = PlanDiff.Report(r.added, r.removed, wl)
    assert(explained.unexplained.isEmpty)
    assert(PlanDiff.toJson(explained).contains(""""whitelisted":"intentional rework""""))
  }
}
