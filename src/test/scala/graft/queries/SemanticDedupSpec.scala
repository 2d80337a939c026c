package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantic-dedup and IVF-PQ invariants that the DuckDB oracle cannot
  * express: cross-query consistency against the exact pair baseline, and
  * the structural contract of the PQ search output. */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("semantic_dedup drops are a subset of the exact near-dup pairs") {
    val dropped = SimilarityQueries.semanticDedup(spark, dir).collect()
    assert(dropped.nonEmpty)

    // structural contract: the witness is a lower id (it may ITSELF be
    // dropped in a chain a–b–c — the roster identifies evicting pairs,
    // not survivors), similarity is at/above the threshold, one row per
    // dropped vector
    dropped.foreach { r =>
      assert(r.getAs[Long]("witness_id") < r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("max_sim") >= 0.35)
    }
    assert(dropped.map(_.getAs[Long]("vec_id")).distinct.length === dropped.length)

    // witness chains ground out in survivors: the smallest dropped id of
    // each cluster must have a KEPT witness (its witness is smaller than
    // every dropped id there, so it cannot itself be dropped)
    val droppedIds = dropped.map(_.getAs[Long]("vec_id")).toSet
    dropped.groupBy(_.getAs[Int]("cluster")).foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[Long]("vec_id"))
      assert(!droppedIds.contains(first.getAs[Long]("witness_id")))
    }

    // every (witness, dropped) pair is a true >= 0.35 cosine pair: the
    // exact O(N²) baseline (covers all 500 sf0.001 vectors) must contain
    // it — cluster-bounding may MISS cross-cluster pairs but can never
    // invent one
    val exact = SimilarityQueries.nearDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    dropped.foreach { r =>
      val pair = (r.getAs[Long]("witness_id"), r.getAs[Long]("vec_id"))
      assert(exact.contains(pair), s"$pair not in exact near-dup set")
    }
    info(s"semantic dedup dropped ${dropped.length} of 500 vectors " +
      s"(exact baseline pair count: ${exact.size})")
  }

  test("knn_ivfpq returns a full, well-formed top-5 per query; recall is measured") {
    val rows = SimilarityQueries.knnIvfPq(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      rs.foreach(r => assert(r.getAs[Double]("adc_dist") >= 0.0))
    }

    // ADC distances are quantized approximations — recall vs the exact
    // search is the quality dial (codebook size / Lloyd iterations);
    // reported, and required nonzero: a PQ index that never agrees with
    // brute force on ANY neighbor is miscoded, not merely coarse
    val brute = SimilarityQueries.knnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    info(f"IVF-PQ (2-probe, ${10} codewords) recall vs brute top-5: $recall%.2f")
    assert(recall > 0.0)
  }
}
