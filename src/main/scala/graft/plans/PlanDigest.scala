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

  /** One parquet scan in the digested plan. `kind` (r13, refined r14)
    * separates the scans the executed form actually performs from
    * lineage-view repetitions, so a pushdown audit stops
    * re-adjudicating checkpoint re-reads by hand (`snm_multipass_dups`
    * digests 42 scans, 40 of them unpushed re-reads of its
    * checkpointed shingle frame):
    *  - `base` — a scan the executed plan runs directly;
    *  - `materialized` — the FIRST plan-order occurrence of a
    *    (table, pushed, cols) signature that appears in the STANDALONE
    *    plan of a frame the executed form checkpoints
    *    (`materializeOnce`): at runtime that subtree's scans run once,
    *    inside the checkpoint build, and downstream consumers read the
    *    checkpoint;
    *  - `lineage` (r14) — every FURTHER occurrence of a materialized
    *    signature: audit-mode lineage of the checkpointed subtree, not
    *    (necessarily) runtime I/O. At most one occurrence per
    *    signature is tagged `materialized` (r13 tagged them all, which
    *    let a genuine base scan that happened to share a signature
    *    disappear into the materialized class — the r13 ADVICE's
    *    under-gate; a colliding genuine scan is now at worst tagged
    *    `lineage`, which participates in the pushdown gate like base).
    * The kinds are REPORTING precision — a consumer tells checkpoint
    * lineage from runtime reads without hand adjudication. The
    * cross-round pushdown gate ([[PlanDiff.diffQuery]]) compares the
    * all-scans pushed total, in which every kind participates. */
  case class ScanInfo(table: String, pushedFilters: Int, readCols: Int,
      kind: String = "base")

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
    * form's checkpoint-boundary count AND its scan-kind tags (the
    * counter collects each materialized subtree's standalone scan
    * signatures as the build walks through `materializeOnce`). The
    * caller must already be in audit mode (`graft.materialize=off`) —
    * otherwise the counter stays 0 and the plan is the truncated
    * executed form. */
  def digestBuilt(fn: => DataFrame): Digest = {
    graft.queries.MaterializeCounter.reset()
    val df = fn
    digest(df, graft.queries.MaterializeCounter.scanSignatures)
      .copy(materializePoints = graft.queries.MaterializeCounter.value)
  }

  /** The stage-prepared physical plan the digest reads (AQE initial
    * plan — exchanges inserted, runtime stats not yet applied). */
  private def preparedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      // initialPlan (not inputPlan): exchanges are inserted by the
      // stage-preparation rules, and the digest exists to count them
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def collectScans(plan: SparkPlan): Seq[(String, Int, Int)] =
    plan.collect {
      case s: FileSourceScanExec =>
        val table = s.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?")
        // pushedDownFilters is protected; the scan's public metadata
        // renders it as "[f1, f2, …]" — count depth-0 commas (nested
        // commas inside In(…)/StringContains(…) stay inside brackets)
        val pushed = s.metadata.get("PushedFilters")
          .fold(0)(countTopLevelFilters)
        (table, pushed, s.requiredSchema.size)
    }

  /** The (table, pushed, cols) signatures of `df`'s own physical scans —
    * what `materializeOnce` records for a subtree it would checkpoint,
    * and exactly the scans the checkpoint build performs at runtime. */
  def scanSignatures(df: DataFrame): Set[(String, Int, Int)] =
    collectScans(preparedPlan(df)).toSet

  def digest(df: DataFrame,
      materializedSigs: Set[(String, Int, Int)] = Set.empty): Digest = {
    val plan = preparedPlan(df)
    val nodes = plan.collect { case n => n }
    val joins = nodes.map(_.nodeName).filter(_.endsWith("Join"))
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    // at most ONE occurrence per materialized signature gets the
    // `materialized` tag (plan order decides — first wins); surplus
    // identical scans are `lineage`. Sorting is by the full ScanInfo
    // including kind so identical-signature entries order
    // deterministically.
    val taggedOnce = scala.collection.mutable.Set.empty[(String, Int, Int)]
    val scans = collectScans(plan).map { case sig @ (table, pushed, cols) =>
      val kind =
        if (!materializedSigs(sig)) "base"
        else if (taggedOnce.add(sig)) "materialized"
        else "lineage"
      ScanInfo(table, pushed, cols, kind)
    }.sortBy(si => (si.table, si.pushedFilters, si.readCols, si.kind))
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
      s"""{"table":"${si.table}","pushed":${si.pushedFilters},"cols":${si.readCols},"kind":"${si.kind}"}"""
    }.mkString(",")
    s"""{"query":"$name","shuffle_exchanges":${d.shuffleExchanges},""" +
      s""""broadcast_exchanges":${d.broadcastExchanges},""" +
      s""""joins":{$joins},"sorts":${d.sorts},"windows":${d.windows},""" +
      s""""materialize_points":${d.materializePoints},"scans":[$scans]}"""
  }
}
