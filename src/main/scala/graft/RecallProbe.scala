package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ANN tuning probe (same family as Profile/ScaleSmoke): recall@5
  * of the Lloyd-refined IVF search vs the exact top-5, swept over the two
  * index dials — Lloyd iterations and probe budget. The registered
  * `knn_recall_curve` entry publishes the production curve (iters = 3);
  * this main is where the saturation claim in COVERAGE.md is measured.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val brute = graft.queries.SimilarityQueries.knnBrute(spark, sfDir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (iters <- Seq(1, 2, 3, 4, 6); probes <- Seq(1, 2, 4)) {
      val got = graft.queries.SimilarityQueries
        .knnIvfRefined(spark, sfDir, probes = probes, iters = iters)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(brute).size.toDouble / brute.size
      println(f"[recall] iters=$iters%d probes=$probes%d recall@5=$recall%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
