package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the round-7 inference tier: one-way
  * ANOVA, the hash-relabeling permutation test, and CUPED adjustment.
  * Each recount re-derives the expected output from the raw tables with
  * independent Scala code at sf0.001. */
class InferenceTierSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The query modules' token-count contract, re-derived independently:
    * trim the explicit 6-char whitespace set, then split on runs. */
  private def tokenCount(text: String): Long = {
    val Ws = " \t\n\r\f"
    val t = Option(text).getOrElse("")
      .dropWhile(Ws.contains(_)).reverse.dropWhile(Ws.contains(_)).reverse
    if (t.isEmpty) 0L else t.split("\\s+").length.toLong
  }

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("source_anova_f: decomposition matches a brute-force group recount") {
    val docs = Tables.documents(spark, dir)
      .select("source", "text").collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(r => tokenCount(r.getAs[String]("text"))).toVector)
      .toMap
    val k = docs.size.toLong
    val nDocs = docs.values.map(_.size.toLong).sum
    val bigS = docs.values.flatten.sum
    val q = docs.values.flatten.map(w => BigInt(w) * w).sum
    val b = docs.values.map { g =>
      (BigInt(g.sum) * g.sum * 1000000 / g.size).toLong }.sum
    val ssb = b - (BigInt(bigS) * bigS * 1000000 / nDocs).toLong
    val ssw = (q * 1000000).toLong - b
    val r = PipelineQueries.sourceAnovaF(spark, dir).collect().head
    assert(r.getAs[Long]("k") === k)
    assert(r.getAs[Long]("n_docs") === nDocs)
    assert(r.getAs[Long]("ssb_micro") === ssb)
    assert(r.getAs[Long]("ssw_micro") === ssw)
    val f = math.floor((ssb.toDouble / (k - 1))
      / (ssw.toDouble / (nDocs - k)) * 1e6) / 1e6
    assert(r.getAs[Double]("f_stat") === f)
    assert(r.getAs[Long]("eta_sq_ppm") === ssb * 1000000L / (ssb + ssw))
  }

  test("source_permutation_test: p-value matches an independent replay of all relabelings") {
    val docs = Tables.documents(spark, dir)
      .filter(col("source").isin("src0", "src1"))
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        tokenCount(r.getAs[String]("text"))))
    def deltaMicro(g0: Seq[Long], g1: Seq[Long]): Long =
      g0.sum * 1000000 / g0.size - g1.sum * 1000000 / g1.size
    val obs = deltaMicro(
      docs.filter(_._2 == "src0").map(_._3).toSeq,
      docs.filter(_._2 == "src1").map(_._3).toSeq)
    val deltas = (0 until 200).flatMap { seed =>
      val (g0, g1) = docs.partition(d => md5h60(s"$seed:${d._1}") % 2 == 0)
      if (g0.isEmpty || g1.isEmpty) None
      else Some(deltaMicro(g0.map(_._3).toSeq, g1.map(_._3).toSeq))
    }
    val extreme = deltas.count(d => math.abs(d) >= math.abs(obs)).toLong
    val r = PipelineQueries.sourcePermutationTest(spark, dir).collect().head
    assert(r.getAs[Long]("delta_obs_micro") === obs)
    assert(r.getAs[Long]("n_valid_perms") === deltas.size.toLong)
    assert(r.getAs[Long]("n_extreme") === extreme)
    assert(r.getAs[Long]("p_ppm") ===
      (extreme + 1) * 1000000 / (deltas.size + 1))
  }

  test("cuped_adjusted_lift: theta, adjusted lift, and rho^2 match a user-level recount") {
    val split = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val users = Tables.events(spark, dir)
      .select("user_id", "ts", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, evs) =>
        val x = evs.count(
          _.getAs[java.sql.Timestamp]("ts").toLocalDateTime.isBefore(split))
        val y = evs.count(e =>
          !e.getAs[java.sql.Timestamp]("ts").toLocalDateTime.isBefore(split)
            && e.getAs[String]("event_type") == "purchase")
        (u % 2, x.toLong, y.toLong)
      }.toVector
    val n = users.size.toLong
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxx = users.map(u => BigInt(u._2) * u._2).sum
    val sxy = users.map(u => BigInt(u._2) * u._3).sum
    val syy = users.map(u => BigInt(u._3) * u._3).sum
    val covNum = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val varXNum = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val varYNum = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
    val theta = covNum / varXNum
    def arm(a: Long) = users.filter(_._1 == a)
    val (a0, a1) = (arm(0), arm(1))
    val adj = (a1.map(_._3).sum.toDouble / a1.size
      - a0.map(_._3).sum.toDouble / a0.size) -
      theta * (a1.map(_._2).sum.toDouble / a1.size
        - a0.map(_._2).sum.toDouble / a0.size)
    val r = ExperimentQueries.cupedAdjustedLift(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") === n)
    assert(r.getAs[Long]("n_a") === a0.size.toLong)
    assert(r.getAs[Long]("n_b") === a1.size.toLong)
    assert(r.getAs[Long]("raw_lift_micro") ===
      a1.map(_._3).sum * 1000000 / a1.size - a0.map(_._3).sum * 1000000 / a0.size)
    assert(r.getAs[Double]("theta") === math.floor(theta * 1e6) / 1e6)
    assert(r.getAs[Double]("adj_lift") === math.floor(adj * 1e6) / 1e6)
    assert(r.getAs[Double]("rho_sq") ===
      math.floor(covNum * covNum / (varXNum * varYNum) * 1e6) / 1e6)
    // the covariate must actually help on this feed — pre-activity
    // predicts post-purchases — or the CUPED entry is exercising nothing
    assert(r.getAs[Double]("rho_sq") > 0.01)
  }
}
