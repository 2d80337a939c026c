package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Permutation invariants of the seeded corpus shuffle — properties the
  * value-hash oracle implies but does not state. */
class CorpusShuffleSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("shuffle is a permutation: every doc exactly once, positions dense per shard") {
    val rows = PipelineQueries.corpusShuffle(spark, dir).collect()
    val n = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.length === n)
    assert(rows.map(_.getLong(2)).distinct.length === n, "a doc appears twice")
    rows.groupBy(_.getInt(0)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getInt(1)).sorted
      assert(pos.toSeq === (1 to rs.length), s"shard $shard positions not dense")
    }
  }

  test("a different seed re-deals; the same seed reproduces bit-for-bit") {
    val a = PipelineQueries.corpusShuffle(spark, dir, seed = 42).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val b = PipelineQueries.corpusShuffle(spark, dir, seed = 42).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq, "same seed must reproduce the permutation")
    val c = PipelineQueries.corpusShuffle(spark, dir, seed = 7).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(c.toSeq !== a.toSeq, "a new seed must re-deal the permutation")
    // and it is still a permutation of the same docs
    assert(c.map(_._3).sorted.toSeq === a.map(_._3).sorted.toSeq)
  }
}
