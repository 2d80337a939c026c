package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** First-principles recounts for the deterministic-sketch tier — the
  * engine-neutral HLL / CMS / isqrt arithmetic re-derived in plain Scala
  * (MessageDigest md5, BigInt) with no Spark expressions, so a hash-idiom
  * regression on EITHER engine side surfaces here even though the two
  * dialects are written to mirror each other. */
class SketchQueriesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The corpus hash idiom: first 15 hex chars of md5 as a 60-bit int. */
  private def h60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("docs_hll_cardinality registers and estimate match a Scala recount") {
    val texts = Tables.documents(spark, dir)
      .select(col("text")).collect().map(_.getString(0))
    val regs = Array.fill(256)(0L)
    texts.foreach { t =>
      val h = h60(t)
      val idx = (h % 256).toInt
      val rest = h / 256
      val rho = if (rest == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > regs(idx)) regs(idx) = rho
    }
    val nonempty = regs.count(_ > 0)
    val sScaled = regs.map(m => if (m == 0) 1L << 53 else 1L << (53 - m).toInt).sum
    val est = (BigInt(7213) * BigInt(256).pow(3) * BigInt(2).pow(53) /
      (BigInt(2570790) * BigInt(sScaled))).toLong
    val exact = texts.distinct.length.toLong

    val row = DedupQueries.docsHllCardinality(spark, dir).collect()(0)
    assert(row.getAs[Long]("nonempty") === nonempty.toLong)
    assert(row.getAs[Long]("s_scaled") === sScaled)
    assert(row.getAs[Long]("est") === est)
    assert(row.getAs[Long]("exact_distinct") === exact)
    // the estimate should actually be an estimate: within 2/sqrt(256) ≈
    // 12.5% of truth (2 standard errors for HLL at m=256)
    assert(math.abs(est - exact) <= exact / 8,
      s"HLL est $est vs exact $exact — register pipeline suspect")
  }

  test("token_cms_freq_est honors the one-sided CMS guarantee and exact top-20") {
    val rows = TextQueries.tokenCmsFreqEst(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overest") >= 0L,
        s"CMS underestimated '${r.getAs[String]("tok")}' — impossible for a correct sketch")
      assert(r.getAs[Long]("est_cnt") ===
        r.getAs[Long]("exact_cnt") + r.getAs[Long]("overest"))
    }
    // exact leg recount: the top-20 (count desc, token asc) from raw text
    // the query's exact trim contract: strip the Java \s set (6 chars)
    // from both ends, NOT String.trim's <= U+0020 — the RankStatsSpec
    // control-character lesson
    val counts = Tables.documents(spark, dir)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val tr = t.replaceAll("^\\s+|\\s+$", "")
        if (tr.isEmpty) Array.empty[String] else tr.split("\\s+")
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val top = counts.sortBy { case (tok, n) => (-n, tok) }.take(20)
    assert(rows.map(r => (r.getAs[String]("tok"), r.getAs[Long]("exact_cnt"))).toSeq
      === top)
  }

  test("lang_temperature_mix carries exact integer sqrt micro-weights") {
    val rows = PipelineQueries.langTemperatureMix(spark, dir).collect()
    assert(rows.nonEmpty)
    var t2Sum = 0L
    var t1Sum = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val w = r.getAs[Long]("w_micro")
      val x = BigInt(n) * BigInt(1000000000000L)
      // w is EXACTLY floor(sqrt(n * 10^12)) — the ±1 correction must have
      // erased any float-seed rounding
      assert(BigInt(w).pow(2) <= x && BigInt(w + 1).pow(2) > x,
        s"w_micro $w is not floor(sqrt($x))")
      t2Sum += r.getAs[Long]("share_ppm_t2")
      t1Sum += r.getAs[Long]("share_ppm_t1")
    }
    // floor fixed-point shares: sum in (1e6 - |langs|, 1e6]
    assert(t2Sum <= 1000000L && t2Sum > 1000000L - rows.length)
    assert(t1Sum <= 1000000L && t1Sum > 1000000L - rows.length)
    // the flattening observable: the largest language's T=2 share is
    // strictly below its proportional share (the corpus is lang-skewed)
    val biggest = rows.maxBy(_.getAs[Long]("n_docs"))
    assert(biggest.getAs[Long]("share_ppm_t2") < biggest.getAs[Long]("share_ppm_t1"))
  }

  test("error_nearest_reading picks the true nearest side per error") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value")).collect()
    def us(t: java.sql.Timestamp): Long =
      (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000L
    val readings = ev
      .filter(r => r.getAs[String]("event_type") != "error" && !r.isNullAt(4))
      .map(r => (r.getAs[Long]("user_id"), us(r.getAs[java.sql.Timestamp]("ts"))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = TimeSeriesQueries.errorNearestReading(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val eUs = us(r.getAs[java.sql.Timestamp]("error_ts"))
      val rs = readings.getOrElse(r.getAs[Long]("user_id"), Array.empty[Long])
      val trueMin = if (rs.isEmpty) None else Some(rs.map(t => math.abs(t - eUs)).min)
      r.getAs[String]("direction") match {
        case "none" =>
          assert(trueMin.isEmpty && r.isNullAt(r.fieldIndex("gap_us")))
        case d =>
          assert(r.getAs[Long]("gap_us") === trueMin.get,
            s"error ${r.getAs[Long]("error_id")}: picked gap not minimal")
          val rUs = us(r.getAs[java.sql.Timestamp]("r_ts"))
          assert(if (d == "prev") rUs <= eUs else rUs > eUs)
      }
    }
  }
}
