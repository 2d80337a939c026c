package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Independent recounts for the batch-2 round-3 operators: triangle
  * census, incremental dedup labeling, BPE pair counting, sweep-line
  * concurrency, winsorized moments. */
class GraphStatsOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("part_triangles matches a brute-force census of the same edge set") {
    val row = AnalyticsQueries.partTriangles(spark, dir).collect().head
    // re-derive the oriented edge set independently
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { basket =>
      val parts = basket.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toVector.groupBy(identity)
      // NB: .collect{...=> e} on a Map would rebuild a Map and silently
      // dedup by e._1 — filter + keySet keeps the full edge set
      .filter(_._2.size >= 2).keySet
    assert(row.getAs[Long]("n_edges") === edges.size)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    assert(row.getAs[Long]("n_wedges") === deg.map(d => d * (d - 1) / 2).sum)
    val tri = (for {
      (a, b) <- edges
      c <- edges.collect { case (`b`, z) => z }
      if edges.contains((a, c))
    } yield (a, b, c)).size
    assert(row.getAs[Long]("n_triangles") === tri)
  }

  test("incremental_dedup labels are re-derivable from raw fingerprints") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextFunctions.fingerprint(org.apache.spark.sql.functions.col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp"))
    val baseFps = docs.collect { case (id, fp) if id % 10 < 8 => fp }.toSet
    val delta = docs.filter(_._1 % 10 >= 8)
    val expected = delta.map { case (id, fp) =>
      val status =
        if (baseFps.contains(fp)) "dup_of_base"
        else if (delta.exists(d => d._2 == fp && d._1 < id)) "dup_in_delta"
        else "new"
      id -> status
    }.toMap
    val got = DedupQueries.incrementalDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === expected)
    assert(got.size === delta.length, "every delta doc must be labeled exactly once")
  }

  test("bpe_merge_pairs counts match a direct token-stream recount") {
    val got = AnalyticsQueriesHelpers.collectPairs(spark, dir)
    val toks = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .collect().map(_.getString(0))
    val counts = toks.filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }
    val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got === top)
  }

  test("max_concurrent_sessions matches a scan over collected sessions") {
    val row = RelationalQueries.maxConcurrentSessions(spark, dir).collect().head
    val sessions = RelationalQueries.userSessions(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime))
    // sweep: +1 at start, -1 at end; ends before starts at ties
    val events = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy { case (t, d) => (t, d) }
    var cur = 0L; var best = 0L; var bestAt = 0L
    events.foreach { case (t, d) =>
      cur += d
      if (cur > best) { best = cur; bestAt = t }
    }
    assert(row.getAs[Long]("max_concurrent") === best)
    assert(row.getAs[java.sql.Timestamp]("first_at").getTime === bestAt)
  }

  test("orders_winsorized: clamped stats are tighter than raw, bounds ordered") {
    val row = AnalyticsQueries.ordersWinsorized(spark, dir).collect().head
    assert(row.getAs[Double]("lo") < row.getAs[Double]("hi"))
    val mean = row.getAs[Double]("win_mean")
    assert(mean >= row.getAs[Double]("lo") && mean <= row.getAs[Double]("hi"))
    val rawStd = Tables.orders(spark, dir)
      .agg(org.apache.spark.sql.functions.stddev_samp(
        org.apache.spark.sql.functions.col("o_totalprice")))
      .collect().head.getDouble(0)
    assert(row.getAs[Double]("win_stddev") > 0)
    assert(row.getAs[Double]("win_stddev") <= rawStd,
      "clamping the tails must not increase dispersion")
  }
}

/** Tiny helper kept out of the test bodies for reuse/clarity. */
private object AnalyticsQueriesHelpers {
  def collectPairs(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, Long)] =
    CorpusQueries.bpeMergePairs(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toSeq
}
