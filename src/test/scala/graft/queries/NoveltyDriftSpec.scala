package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Semantic anchors for ingestion-order novelty and PSI drift. */
class NoveltyDriftSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("doc_ngram_novelty: novel counts partition the distinct-shingle universe") {
    val rows = DedupQueries.docNgramNovelty(spark, dir).collect()
    val universe = graft.operators.DedupOps
      .docShingles(Tables.documents(spark, dir))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("shingles")).as("s"))
      .distinct().count()
    // every distinct shingle is novel in exactly one doc (its first)
    assert(rows.map(_.getAs[Long]("n_novel")).sum === universe)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    // the earliest scored doc has nothing before it — everything is novel
    val firstDoc = rows.minBy(_.getAs[Long]("doc_id"))
    assert(firstDoc.getAs[Double]("novelty") === 1.0)
  }

  test("label_psi: distributions are proper and PSI is a nonnegative sum of terms") {
    val rows = AnalyticsQueries.labelPsi(spark, dir).collect()
    assert(rows.nonEmpty)
    // each slice's shares sum to ~1 (rounded per-label output)
    assert(math.abs(rows.map(_.getAs[Double]("p_ref")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("p_cur")).sum - 1.0) < 1e-4)
    // every present-in-both term is (p-q)ln(p/q) >= 0
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("psi_term")).foreach(t => assert(t >= -1e-9))
    }
    val psi = rows.head.getAs[Double]("psi_total")
    assert(rows.forall(_.getAs[Double]("psi_total") === psi), "total must be constant")
    assert(psi >= 0.0)
  }
}
