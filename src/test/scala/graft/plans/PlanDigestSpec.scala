package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit behavior of the plan-shape digest itself — the artifact test in
  * `RegistryAuditSpec` proves currency, this one proves the digest
  * MEASURES what it claims on constructed plans (a broken node counter
  * or filter parser would make the currency test vacuously green on
  * wrong numbers). */
class PlanDigestSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("counts exchanges, join strategy and pushdown on a broadcast join") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") < 100).select("doc_id", "lang")
    val langs = docs.select(col("lang")).distinct()
      .withColumn("tag", lit(1))
    val d = PlanDigest.digest(docs.join(broadcast(langs), Seq("lang")))
    assert(d.broadcastExchanges === 1)
    assert(d.joins === Seq("BroadcastHashJoin" -> 1))
    // distinct shuffles once (partial+final hash agg around one exchange)
    assert(d.shuffleExchanges === 1, d.toString)
    // both scans read the same table; the filtered one pushes doc_id
    // predicates and prunes to 2 columns
    assert(d.scans.map(_.table).distinct === Seq("documents.parquet"))
    assert(d.scans.exists(si => si.pushedFilters >= 1 && si.readCols === 2),
      d.scans.toString)
  }

  test("counts a sort-merge join and its sorts when broadcast is disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = graft.sources.Tables.documents(spark, dir).select("doc_id", "lang")
      val b = graft.sources.Tables.documents(spark, dir).select("doc_id", "source")
      val d = PlanDigest.digest(a.join(b, Seq("doc_id")))
      assert(d.joins === Seq("SortMergeJoin" -> 1))
      assert(d.shuffleExchanges === 2 && d.sorts === 2, d.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pushed-filter counting handles nesting and the empty case") {
    val none = PlanDigest.digest(
      graft.sources.Tables.documents(spark, dir).select("text"))
    assert(none.scans.map(_.pushedFilters) === Seq(0))
    // In(...) renders with nested commas — the depth-aware counter must
    // read it as exactly ONE pushed filter, not three
    val in = PlanDigest.digest(graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id").isin(1L, 2L, 3L)).select("doc_id"))
    assert(in.scans.map(_.pushedFilters) === Seq(1), in.scans.toString)
  }
}
