package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.DedupOps
import graft.sources.Tables

/** The prefix-filtered exact similarity join must be NO-MISS: unlike the
  * MinHash/SimHash sketch paths (probabilistic recall), the prefix lemma
  * guarantees every pair with Jaccard ≥ τ survives candidate generation.
  * This spec checks the guarantee against brute force, the containment
  * relation to the LSH path, and that the filter actually filters. */
class PrefixJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val tau = DedupQueries.PrefixTau

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))

  test("prefix join equals the brute-force all-pairs result (no-miss)") {
    val sh = DedupOps.docShingles(Tables.documents(spark, dir))
    val brute = sh.select(col("doc_id").as("a_id"), col("shingles").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("b_id"), col("shingles").as("sb")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", round(DedupOps.jaccard(col("sa"), col("sb")), 6))
      .filter(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
      .collect().map(r => pairKey(r) -> r.getAs[Double]("jaccard")).toSeq.sortBy(_._1)
    val prefixed = DedupQueries.jaccardPrefixJoin(spark, dir)
      .collect().map(r => pairKey(r) -> r.getAs[Double]("jaccard")).toSeq.sortBy(_._1)
    assert(brute.nonEmpty, "corpus has no qualifying pairs — test is vacuous")
    assert(prefixed === brute)
  }

  test("LSH-found pairs at or above tau are contained in the prefix join") {
    val exact = DedupQueries.jaccardPrefixJoin(spark, dir)
      .collect().map(pairKey).toSet
    val lsh = DedupQueries.minhashLshDups(spark, dir)
      .filter(col("jaccard") >= tau)
      .collect().map(pairKey).toSet
    assert(lsh.subsetOf(exact),
      s"LSH reported pairs the exact join missed: ${lsh -- exact}")
  }

  test("hot-bucket cap only ever removes pairs; a loose cap removes none") {
    val docs = Tables.documents(spark, dir)
    val exact = DedupQueries.jaccardPrefixJoinFrom(spark, docs)
      .collect().map(pairKey).toSet
    val loose = DedupQueries.jaccardPrefixJoinFrom(spark, docs,
      maxBucket = Some(1000000)).collect().map(pairKey).toSet
    assert(loose === exact, "a cap above every bucket size must be a no-op")
    val tight = DedupQueries.jaccardPrefixJoinFrom(spark, docs,
      maxBucket = Some(2)).collect().map(pairKey).toSet
    assert(tight.subsetOf(exact), "the guard must never invent pairs")
  }

  test("the prefix actually shrinks the joinable shingle set") {
    val ex = DedupOps.docShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val full = ex.count()
    // re-derive the prefix exactly as the query builds it
    val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val prefix = ex.join(freq, "s")
      .withColumn("pos", row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("sz", count(lit(1)).over(byDoc))
      .filter(col("pos") <= col("sz") - ceil(col("sz") * lit(tau)) + lit(1))
      .count()
    // tau = 0.5 keeps about half of each set (+1); anything close to the
    // full explode means the filter predicate regressed
    assert(prefix < full * 6 / 10, s"prefix $prefix of $full rows — not filtering")
    assert(prefix > 0)
  }
}
