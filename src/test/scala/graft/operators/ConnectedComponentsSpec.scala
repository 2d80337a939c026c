package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dedup clustering semantics: min-label propagation must converge to the
  * transitive closure's component minima — including on a path graph whose
  * diameter exceeds one propagation round. */
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
}
