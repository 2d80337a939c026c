package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Registry-wide invariants, enforced over EVERY registered query:
  * the whole surface stays UDF-free (codegen-able), and the oracle map
  * cannot reference a query that doesn't exist. */
class RegistryAuditSpec extends AnyFunSuite with SparkSpec {

  test("every oracle entry has a registered query") {
    val orphans = Registry.oracle.keySet -- Registry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("no UDF nodes in any registered query plan") {
    val dir = "/root/testdata/sf0.001"
    val offenders = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("ScalaUDF") || plan.contains("BatchEvalPython"))
        Some(name)
      else None
    }
    spark.catalog.clearCache() // several queries cache build frames
    assert(offenders.isEmpty, s"UDF nodes in: $offenders")
  }

  // the two labeled O(N²) recall baselines are the ONLY queries allowed
  // to plan an unbroadcast all-pairs product (their scale paths are the
  // LSH variants); everything else planning one is a regression
  private val allPairsBaselines = Set("near_dup_pairs", "ngram_jaccard_pairs")

  test("no CartesianProduct outside the labeled all-pairs baselines") {
    val dir = "/root/testdata/sf0.001"
    val offenders = Registry.queries.toSeq.sortBy(_._1)
      .filterNot(q => allPairsBaselines(q._1))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty, s"unbroadcast all-pairs plans in: $offenders")
  }
}
