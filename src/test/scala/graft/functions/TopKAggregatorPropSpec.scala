package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the typed top-k aggregator — the algebra that
  * makes it CORRECT under Spark's partial aggregation: any split of the
  * input into partitions, folded independently and merged in any order,
  * must equal the global sort-take. Checked over 300 seeded random
  * inputs (duplicate-heavy scores on purpose: ties are where orderings
  * break and the id tiebreak must do the work). Generators are driven
  * directly with fixed seeds — deterministic, no forAll bridge needed. */
class TopKAggregatorPropSpec extends AnyFunSuite {

  private val k = 3
  private val agg = TopKAggregator(k)

  private val rowGen = for {
    score <- Gen.chooseNum(0, 9).map(_.toDouble)
    id <- Gen.chooseNum(0L, 50L)
  } yield (score, id)
  private val rowsGen = Gen.listOfN(40, rowGen)

  private def cases: Seq[List[(Double, Long)]] =
    (1 to 300).map(i =>
      rowsGen.pureApply(Gen.Parameters.default, Seed(i.toLong)).distinct)

  private def reference(rows: List[(Double, Long)]): Seq[Long] =
    rows.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)

  private def fold(rows: List[(Double, Long)]): List[(Double, Long)] =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("fold ≡ global sort-take on 300 random inputs") {
    cases.foreach { rows =>
      assert(agg.finish(fold(rows)) === reference(rows), s"input: $rows")
    }
  }

  test("every 2-way partition split, merged in both orders, equals the global fold") {
    cases.take(60).foreach { rows =>
      (0 to rows.length).foreach { cut =>
        val (a, b) = rows.splitAt(cut)
        assert(agg.finish(agg.merge(fold(a), fold(b))) === reference(rows),
          s"split at $cut of: $rows")
        // merge must commute — Spark does not promise merge order
        assert(agg.finish(agg.merge(fold(b), fold(a))) === reference(rows))
      }
    }
  }

  test("buffers stay bounded by k through reduce and merge") {
    cases.foreach { rows =>
      val buf = fold(rows)
      assert(buf.length <= k)
      assert(agg.merge(buf, buf).length <= k)
    }
  }
}
