package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Recount anchors for the closing round-3 operators. */
class ClosingOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media_dedup partitions the media set; survivors are distinct minima") {
    val rows = MultimodalQueries.mediaDedup(spark, dir).collect()
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_copies")).sum === total,
      "every blob lands in exactly one digest group")
    val keeps = rows.map(_.getAs[Long]("keep_media_id"))
    assert(keeps.distinct.length === keeps.length)
    // digest grouping must agree with raw-byte equality: same text → same digest
    val texts = Tables.documents(spark, dir).select("text").collect().map(_.getString(0))
    assert(rows.length === texts.distinct.length,
      "digest groups must equal distinct raw contents (no collisions at this size)")
  }

  test("events_wau_mau recomputes from first principles") {
    val row = AnalyticsQueries.eventsWauMau(spark, dir).collect()
    assert(row.nonEmpty)
    val r = row.head
    val mau = Tables.events(spark, dir)
      .selectExpr("date_trunc('month', ts) AS m", "user_id").distinct()
      .groupBy("m").count().collect().head.getLong(1)
    assert(r.getAs[Long]("mau") === mau)
    val weekly = Tables.events(spark, dir)
      .selectExpr("date_trunc('week', ts) AS w", "user_id").distinct()
      .groupBy("w").count().collect().map(_.getLong(1))
    assert(r.getAs[Long]("n_weeks") === weekly.length)
    val expAvg = math.floor(weekly.sum.toDouble * 1e4 / weekly.length) / 1e4
    assert(r.getAs[Double]("avg_wau") === expAvg)
    val st = r.getAs[Double]("stickiness")
    assert(st > 0 && st <= 1.0 + 1e-9, "weekly actives cannot exceed monthly actives")
  }

  test("region_nation_list strings agree with a collected sort") {
    val rows = AnalyticsQueries.regionNationList(spark, dir).collect()
    assert(rows.length === 5)
    val byRegion = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .select("r_name", "n_name").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val expected = byRegion(r.getAs[String]("r_name")).map(_.getString(1)).sorted
      assert(r.getAs[String]("nations") === expected.mkString(","))
      assert(r.getAs[Long]("n_nations") === expected.length)
    }
  }

  test("knn_ivf_filtered ⊆ probed partitions ∩ metadata filter") {
    val keep = Tables.documents(spark, dir)
      .where("lang = 'en' AND n_chars >= 200")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val rows = SimilarityQueries.knnIvfFiltered(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(keep.contains(r.getAs[Long]("vec_id")),
        s"IVF-filtered neighbor ${r.getAs[Long]("vec_id")} fails the predicate")
    }
    // filtered probe can only lose candidates vs the unfiltered probe at
    // the same budget — per query, filtered top-5 sims never exceed the
    // unfiltered probe-2 top-5 at the same rank
    val unf = SimilarityQueries.knnIvfProbes(spark, dir, probes = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) -> r.getAs[Double]("cos_sim"))
      .toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Int]("rank"))
      unf.get(key).foreach(u => assert(r.getAs[Double]("cos_sim") <= u + 1e-9))
    }
  }
}
