package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Semantic checks for filtered ANN and hybrid RRF fusion. */
class RetrievalOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("knn_filtered returns only predicate-passing neighbors, exact over the filtered set") {
    val keep = Tables.documents(spark, dir)
      .where("lang = 'en' AND n_chars >= 200")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keep.nonEmpty && keep.size < 500, "filter must be selective for the test to bite")
    val rows = SimilarityQueries.knnFiltered(spark, dir).collect()
    rows.foreach(r => assert(keep.contains(r.getAs[Long]("vec_id")),
      s"neighbor ${r.getAs[Long]("vec_id")} fails the metadata predicate"))
    // ranks are contiguous 1..5 per query
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5))
    }
    // pre-filter vs post-filter: whenever the unfiltered top-5 contains a
    // filtered-out doc, the filtered result must surface a DIFFERENT doc
    // (the recall post-filtering would have lost)
    val unfiltered = SimilarityQueries.knnBrute(spark, dir).collect()
      .groupBy(_.getAs[Long]("q_id"))
    val filtered = rows.groupBy(_.getAs[Long]("q_id"))
    val affected = unfiltered.filter { case (_, g) =>
      g.exists(r => !keep.contains(r.getAs[Long]("vec_id")))
    }
    assert(affected.nonEmpty, "some unfiltered top-5 must contain filtered-out docs")
    affected.foreach { case (qId, g) =>
      val unfIds = g.map(_.getAs[Long]("vec_id")).toSet
      val filIds = filtered(qId).map(_.getAs[Long]("vec_id")).toSet
      assert((filIds -- unfIds).nonEmpty,
        s"query $qId: filtering must pull in replacements post-filtering cannot")
    }
  }

  test("hybrid_rrf scores recompute from the leg ranks") {
    val rows = CorpusQueries.hybridRrf(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rText = Option(r.getAs[java.lang.Integer]("r_text")).map(_.toInt)
      val rVec = Option(r.getAs[java.lang.Integer]("r_vec")).map(_.toInt)
      assert(rText.isDefined || rVec.isDefined)
      val expected = BigDecimal(
        rText.map(rt => 1.0 / (rt + 60)).getOrElse(0.0) +
          rVec.map(rv => 1.0 / (rv + 60)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 2e-6)
    }
    // fused list is sorted and any doc present in BOTH legs outranks a
    // doc that only matched one leg at the same single-leg rank
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Double]("rrf") >= b.getAs[Double]("rrf"))
      case _ => ()
    }
  }
}
