package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dedup clustering semantics: the pointer-doubling contraction must
  * converge to the transitive closure's component minima — including on
  * path graphs whose diameter exceeds one level's min-neighbor reach —
  * within a pass budget that grows logarithmically, not with diameter. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  test("components of a chain, a clique and a pair; canonical = min id") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — forces multiple rounds),
    // triangle 10-11-12, isolated pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val cc = DedupOps.connectedComponents(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("empty edge list yields an empty component map") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(DedupOps.connectedComponents(spark, empty).count() === 0)
  }

  test("deep chain converges in logarithmic passes, not diameter") {
    import spark.implicits._
    // a 200-node path (diameter 199): the old min-label loop needed ~200
    // edge-sized rounds here; pointer-doubling contraction must finish
    // within the 40-pass default cap (halving doubles pointer depth per
    // node-sized join, contraction shrinks the remainder geometrically)
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (cc, rounds) = DedupOps.connectedComponentsWithRounds(spark, edges)
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 200)
    assert(labels.forall(_._2 === 1L), "every chain node labels to the min")
    assert(rounds <= 25, s"expected O(log n) passes on a 200-chain, got $rounds")
  }

  test("self-loops, duplicate and reversed edges are harmless") {
    import spark.implicits._
    // 7-7 self-loop (isolated singleton), 1-2 listed thrice in both
    // orientations, 2-3 closing a triangle
    val edges = Seq(
      (7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("a_id", "b_id")
    val cc = DedupOps.connectedComponents(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L))
  }
}
