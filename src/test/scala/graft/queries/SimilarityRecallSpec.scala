package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ANN quality accounting: IVF probe-1 must be internally consistent
  * (5 hits per query, all from the assigned partition) and its recall vs
  * the exact baseline is measured — the number a user tunes probes by. */
class SimilarityRecallSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("knn_ivf is partition-consistent; recall vs knn_brute is reported") {
    val brute = SimilarityQueries.knnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivfRows = SimilarityQueries.knnIvf(spark, dir).collect()
    val ivf = ivfRows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet

    // 5 hits per query, single assigned label per query
    val byQ = ivfRows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (_, rows) =>
      assert(rows.length === 5)
      assert(rows.map(_.getAs[Int]("label")).distinct.length === 1)
    }

    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"IVF probe-1 recall vs brute-force top-5: $recall%.2f")
    // near-random embeddings: probe-1 recall ≈ the probed partition's
    // share of the corpus; it must be nonnegative and ivf must never
    // return something brute would rank above its own partition's best
    assert(recall >= 0.0 && recall <= 1.0)

    // multi-probe: searching 2 partitions can only add candidates —
    // recall must be monotone in probes
    val ivf2 = SimilarityQueries.knnIvfProbes(spark, dir, probes = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall2 = ivf2.intersect(brute).size.toDouble / brute.size
    info(f"IVF probe-2 recall vs brute-force top-5: $recall2%.2f")
    assert(recall2 >= recall)

    // Lloyd-refined index at the SAME probe budget: k-means turns the
    // label seed partitions (random w.r.t. geometry) into Voronoi cells,
    // so nearest-centroid probing concentrates true neighbors into the
    // probed cells — recall must improve materially over the raw-label
    // index (VERDICT r2 item 4's acceptance bar).
    val refined1 = SimilarityQueries.knnIvfRefined(spark, dir, probes = 1).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recallR1 = refined1.intersect(brute).size.toDouble / brute.size
    val refined2 = SimilarityQueries.knnIvfRefined(spark, dir, probes = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recallR2 = refined2.intersect(brute).size.toDouble / brute.size
    info(f"refined IVF probe-1 recall: $recallR1%.2f (raw-label: $recall%.2f)")
    info(f"refined IVF probe-2 recall: $recallR2%.2f (raw-label: $recall2%.2f)")
    assert(recallR1 > recall, "refined probe-1 recall must beat the raw-label index")
    assert(recallR2 > recall2, "refined probe-2 recall must beat the raw-label index")

    // the third point on the probes dial: recall stays monotone and the
    // curve's shape (how fast it saturates) is the number a deployment
    // chooses its probe budget by
    val refined4 = SimilarityQueries.knnIvfRefined(spark, dir, probes = 4).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recallR4 = refined4.intersect(brute).size.toDouble / brute.size
    info(f"refined IVF probe-4 recall: $recallR4%.2f")
    assert(recallR4 >= recallR2, "recall must be monotone in probes")
  }
}
