package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Machine-checkable PHYSICAL-plan shape of a query — the per-round
  * `PLANS_r{N}.json` artifact: one JSON line per registry entry with
  * its shuffle/broadcast exchange counts, join-strategy histogram, sort
  * count and per-scan pushdown digest. CORRECTNESS catches value drift
  * and BENCH catches wall-clock drift, but a broadcast silently
  * flipping to a sort-merge join or an exchange creeping into a
  * map-side pipeline is invisible in both until it costs seconds at
  * scale — this digest makes plan REGRESSIONS diffable round over
  * round. Emitted by [[graft.PlanShape]]; `RegistryAuditSpec` recomputes
  * every digest in its shared plan walk and asserts the committed
  * artifact is current.
  *
  * The digest reads the INITIAL physical plan (the AQE initial plan, i.e.
  * what the static planner produced at sf-independent configs), so it
  * is deterministic per (query, testdata SF, session config) and never
  * depends on runtime statistics. */
object PlanDigest {

  case class ScanInfo(table: String, pushedFilters: Int, readCols: Int)

  case class Digest(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      joins: Seq[(String, Int)], // nodeName -> count, name-sorted
      sorts: Int,
      windows: Int, // Window/WindowGroupLimit passes — each is a buffer+walk over every partition
      scans: Seq[ScanInfo], // table-sorted
      // checkpoint boundaries the EXECUTED form inserts (materializeOnce
      // calls counted during the audit-mode build): digests are computed
      // with graft.materialize=off so scan counts show full LINEAGE, and
      // this field is how a consumer tells lineage-view scans from
      // runtime reads (r11; see graft.queries.MaterializeCounter)
      materializePoints: Int = 0)

  /** [[digest]] of a query built by `fn` with the per-thread materialize
    * counter wrapped around the build, so the digest carries the executed
    * form's checkpoint-boundary count. The caller must already be in
    * audit mode (`graft.materialize=off`) — otherwise the counter stays 0
    * and the plan is the truncated executed form. */
  def digestBuilt(fn: => DataFrame): Digest = {
    graft.queries.MaterializeCounter.reset()
    val df = fn
    digest(df).copy(materializePoints = graft.queries.MaterializeCounter.value)
  }

  def digest(df: DataFrame): Digest = {
    val root = df.queryExecution.executedPlan
    val plan: SparkPlan = root match {
      // initialPlan (not inputPlan): exchanges are inserted by the
      // stage-preparation rules, and the digest exists to count them
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val nodes = plan.collect { case n => n }
    val joins = nodes.map(_.nodeName).filter(_.endsWith("Join"))
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    val scans = nodes.collect {
      case s: FileSourceScanExec =>
        val table = s.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?")
        // pushedDownFilters is protected; the scan's public metadata
        // renders it as "[f1, f2, …]" — count depth-0 commas (nested
        // commas inside In(…)/StringContains(…) stay inside brackets)
        val pushed = s.metadata.get("PushedFilters")
          .fold(0)(countTopLevelFilters)
        ScanInfo(table, pushed, s.requiredSchema.size)
    }.sortBy(si => (si.table, si.pushedFilters, si.readCols))
    Digest(
      shuffleExchanges = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcastExchanges = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      joins = joins,
      sorts = nodes.count(_.isInstanceOf[SortExec]),
      windows = nodes.count(n =>
        n.nodeName == "Window" || n.nodeName == "WindowGroupLimit"),
      scans = scans)
  }

  /** Number of top-level filters in a rendered "[f1, f2, …]" list:
    * depth-0 commas + 1 (nested commas inside In(…)/ranges stay behind
    * parens/brackets). A double-quoted literal is opaque: commas and
    * brackets inside it neither split nor move the depth counter, so a
    * pushed value like StringContains(c, "a, [b") cannot miscount.
    * Property-tested in `PlanDigestSpec` against a generated filter
    * grammar that includes quoted-literal atoms. */
  private[plans] def countTopLevelFilters(pf: String): Int = {
    val inner = pf.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) 0
    else {
      var depth = 0
      var inQuote = false
      var n = 1
      inner.foreach { c =>
        if (inQuote) { if (c == '"') inQuote = false }
        else if (c == '"') inQuote = true
        else if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) n += 1
      }
      n
    }
  }

  /** One deterministic JSON line for the artifact. */
  def toJsonLine(name: String, d: Digest): String = {
    val joins = d.joins.map { case (j, n) => s""""$j":$n""" }.mkString(",")
    val scans = d.scans.map { si =>
      s"""{"table":"${si.table}","pushed":${si.pushedFilters},"cols":${si.readCols}}"""
    }.mkString(",")
    s"""{"query":"$name","shuffle_exchanges":${d.shuffleExchanges},""" +
      s""""broadcast_exchanges":${d.broadcastExchanges},""" +
      s""""joins":{$joins},"sorts":${d.sorts},"windows":${d.windows},""" +
      s""""materialize_points":${d.materializePoints},"scans":[$scans]}"""
  }
}
