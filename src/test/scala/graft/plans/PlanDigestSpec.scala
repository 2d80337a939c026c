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

  test("digestBuilt counts materialize points in audit mode, per thread") {
    sys.props("graft.materialize") = "off"
    try {
      // minhashLshDupsFrom places exactly two materialize points (the
      // candidate-pair frame and the candidate shingle frame)
      val docs = graft.sources.Tables.documents(spark, dir)
      val d = PlanDigest.digestBuilt(
        graft.queries.DedupQueries.minhashLshDupsFrom(spark, docs))
      assert(d.materializePoints === 2, d.toString)
      // the json line carries the field
      assert(PlanDigest.toJsonLine("q", d).contains("\"materialize_points\":2"))
      // a second build resets — no leakage across builds on the thread
      assert(PlanDigest.digestBuilt(docs.select(col("doc_id")))
        .materializePoints === 0)
    } finally sys.props.remove("graft.materialize")
  }

  test("digestBuilt tags materialized-subtree scan signatures (r13, r14)") {
    sys.props("graft.materialize") = "off"
    try {
      // minhashLshDupsFrom checkpoints its candidate frames; the full
      // lineage repeats their documents scans per consumer — each
      // recorded subtree signature is tagged kind=materialized exactly
      // ONCE (its one runtime execution, the checkpoint build's read)
      // with every repetition tagged kind=lineage, and no scan here is
      // base (the whole downstream pipeline consumes checkpoints)
      val docs = graft.sources.Tables.documents(spark, dir)
      val d = PlanDigest.digestBuilt(
        graft.queries.DedupQueries.minhashLshDupsFrom(spark, docs))
      val kinds = d.scans.groupBy(_.kind).view.mapValues(_.size).toMap
      assert(kinds.getOrElse("materialized", 0) > 0 &&
        kinds.getOrElse("base", 0) === 0,
        s"expected all-materialized/lineage on the checkpointed query: ${d.scans}")
      // at most one materialized tag per distinct signature (r14 — a
      // genuine scan colliding with a subtree signature must not
      // disappear into the materialized class); repetitions exist on
      // this query, so lineage tags must appear
      val perSig = d.scans.filter(_.kind == "materialized")
        .groupBy(si => (si.table, si.pushedFilters, si.readCols))
      assert(perSig.values.forall(_.size == 1),
        s"a signature carries the materialized tag more than once: ${d.scans}")
      assert(kinds.getOrElse("lineage", 0) > 0,
        s"the multi-consumer lineage repetitions must tag lineage: ${d.scans}")
      // the json line renders both tags
      val jl = PlanDigest.toJsonLine("q", d)
      assert(jl.contains("\"kind\":\"materialized\"") && jl.contains("\"kind\":\"lineage\""))
      // manual tagging: first matching occurrence materialized, the
      // identical second one lineage; untagged digests stay base
      val plain = docs.filter(col("doc_id") < 10).select("doc_id")
      val sig = PlanDigest.scanSignatures(plain)
      assert(sig.size === 1)
      assert(PlanDigest.digest(plain, sig).scans.map(_.kind) === Seq("materialized"))
      assert(PlanDigest.digest(plain.unionAll(plain), sig).scans.map(_.kind)
        === Seq("lineage", "materialized"),
        "identical-signature surplus must tag lineage (sort orders kinds)")
      assert(PlanDigest.digest(plain).scans.map(_.kind) === Seq("base"))
    } finally sys.props.remove("graft.materialize")
  }

  test("digestBuilt reads 0 outside audit mode (checkpoints are real)") {
    val d = PlanDigest.digestBuilt(
      graft.queries.DedupQueries.minhashLshDupsFrom(
        spark, graft.sources.Tables.documents(spark, dir)))
    assert(d.materializePoints === 0, d.toString)
  }

  // property law for the depth-0 comma counter, over a generated filter
  // grammar (nested calls, In-lists, comma-free atoms, and QUOTED
  // literal atoms whose commas/brackets must stay opaque) — seeded
  // generators in the TopKAggregatorPropSpec style, deterministic
  test("top-level filter counting law over 300 generated filter lists") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val atom = Gen.oneOf("IsNotNull(a)", "EqualTo(b,7)", "GreaterThan(c_x,1)",
      "In(d, [1,2,3,4])", "StringContains(t, \"x, y\")",
      "EqualTo(s, \"a, [b) ]\")", "StringStartsWith(u, \"[[,\")")
    def filt(depth: Int): Gen[String] =
      if (depth <= 0) atom
      else Gen.frequency(
        3 -> atom,
        1 -> Gen.zip(filt(depth - 1), filt(depth - 1))
          .map { case (a, b) => s"Or(And($a, $b), $a)" })
    val listGen = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, filt(2)))
    (1 to 300).foreach { i =>
      val fs = listGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val rendered = fs.mkString("[", ", ", "]")
      assert(PlanDigest.countTopLevelFilters(rendered) === fs.length,
        s"seed $i: $rendered")
    }
  }
}
