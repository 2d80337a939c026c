package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Non-vacuity canaries + recounts for the governance/boilerplate batch:
  * the PII counters must actually count on a fixture WITH PII (the
  * corpus is deliberately PII-free, so the oracled zeros alone can't
  * prove the regexes fire), the boilerplate share is recomputed from
  * exact shingle dfs, and the k-anonymity lattice from plain groupings. */
class GovernanceSignalsSpec extends AnyFunSuite with SparkSpec {

  private def df2(rows: Seq[(String, String)], c1: String, c2: String) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(c1,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(c2,
          org.apache.spark.sql.types.StringType))))
  }

  test("PII counters fire on a fixture with real PII spans") {
    val docs = df2(Seq(
      ("web", "visit https://example.com/page now or mail bob@corp.io today"),
      ("web", "call 555 0100 ext 42 about order 9981"),
      ("books", "a perfectly clean sentence with no identifiers at all")),
      "source", "text")
    val got = TextQueries.piiDensityFrom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    val books = got.head; val web = got.last
    assert(web._1 == "web" && books._1 == "books")
    assert(web._4 === 1L, "URL not counted")   // n_urls
    assert(web._5 === 1L, "email not counted") // n_emails
    assert(web._6 === 4L, "number runs not counted") // 555, 0100, 42, 9981
    assert(web._7 === 2L, "docs-with-pii wrong") // both web docs carry PII
    assert(books._4 === 0L && books._5 === 0L && books._6 === 0L && books._7 === 0L)
  }

  test("doc_boilerplate_share matches an exact shingle-df recount at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val Ws = " \t\n\r\f"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.replaceAll(s"^[$Ws]+|[$Ws]+$$", "").split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else if (toks.nonEmpty) Set(toks.mkString(" "))
      else Set.empty
    }
    val sh = docs.map { case (id, t) => (id, shingles(t)) }.filter(_._2.nonEmpty)
    val dfm = sh.flatMap(_._2).groupBy(identity).map { case (s, xs) => (s, xs.length) }
    val expected = sh.map { case (id, ss) =>
      val common = ss.count(s => dfm(s) >= 5).toLong
      (id, ss.size.toLong, common,
        Math.floorDiv(common * 1000000L, ss.size), common * 2 < ss.size.toLong)
    }.sortBy(_._1)
    val got = DedupQueries.docBoilerplateShare(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === expected.toSeq)
  }

  test("customer_kanonymity matches a plain-grouping recount at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.customer(spark, dir)
      .selectExpr("cast(c_nationkey as long) as nk", "c_mktsegment",
        "cast(floor(cast(c_acctbal as double) / 1000) as long) as b")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    def stats(groups: Iterable[Int]): (Long, Long, Long, Long) = {
      val sizes = groups.toSeq
      (sizes.length.toLong, sizes.min.toLong,
        sizes.count(_ < 5).toLong, sizes.filter(_ < 5).map(_.toLong).sum)
    }
    val lvls = Seq(
      rows.groupBy(identity).map(_._2.length),
      rows.groupBy(r => (r._1, r._2)).map(_._2.length),
      rows.groupBy(_._1).map(_._2.length),
      Seq(rows.length))
    val n = rows.length.toLong
    val expected = lvls.zipWithIndex.map { case (g, lvl) =>
      val (ng, mn, viol, risk) = stats(g)
      (lvl.toLong, ng, mn, viol, risk, n, Math.floorDiv(risk * 1000000L, n))
    }

    val got = PipelineQueries.customerKanonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === expected)
    // the lattice must be monotone: generalizing can only shrink risk
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._7 <= a._7, s"risk grew from level ${a._1} to ${b._1}")
    }
  }
}
