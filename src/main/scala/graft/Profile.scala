package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sources.Tables

/** Dev-only micro-profiler for the dedup pipeline stages (the historically
  * hottest path; see DedupOps scaladocs for the formulation decisions this
  * measured). Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    val sh = DedupOps.docShingles(docs).cache()
    time("shingles")(sh.selectExpr("sum(size(shingles))").count())
    time("shingle_explode")(sh.select(explode(col("shingles"))).count())
    time("minhash_wide")(DedupOps.minhashWide(spark, sh).count())
    time("lsh_bands")(DedupOps.bandsFromShingles(spark, sh).count())
    time("lsh_candidates")(DedupOps.candidatesFromShingles(spark, sh).count())
    time("simhash")(DedupOps.simhash48(spark, docs).count())
    time("winnow_fps")(DedupOps.winnowFingerprints(docs).count())
    spark.stop()
  }
}
