package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.DedupOps
import graft.sources.Tables

/** Dev-only micro-profiler for hot stages (not part of the driver contract). */
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    val toks = TextFunctions.tokens(col("text"))
    def gramsSlice =
      array_distinct(when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3)))))
        .when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
    def gramsElemAt =
      array_distinct(when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
    def gramsZip = {
      val b = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
      val c = slice(toks, lit(3), greatest(size(toks) - 2, lit(0)))
      array_distinct(when(size(toks) >= 3,
        filter(
          zip_with(zip_with(toks, b, (x, y) => concat(x, lit(" "), y)), c,
            (xy, z) => concat(xy, lit(" "), z)),
          g => g.isNotNull))
        .when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
    }
    time("explode_slice")(docs.select(explode(gramsSlice)).count())
    time("explode_elem_at")(docs.select(explode(gramsElemAt)).count())
    time("explode_zip")(docs.select(explode(gramsZip)).count())
    time("explode_slice2")(docs.select(explode(gramsSlice)).count())
    time("explode_elem_at2")(docs.select(explode(gramsElemAt)).count())
    time("explode_zip2")(docs.select(explode(gramsZip)).count())
    time("tokens")(docs.select(TextFunctions.tokens(col("text")).as("t")).selectExpr("sum(size(t))").count())
    time("shingles")(DedupOps.docShingles(docs).selectExpr("sum(size(shingles))").count())
    time("shingle_explode")(DedupOps.docShingles(docs).select(explode(col("shingles"))).count())
    time("shingle_h31")(DedupOps.docShingles(docs)
      .select(explode(col("shingles")).as("s")).select(DedupOps.h31(col("s"))).count())
    time("minhash_sigs")(DedupOps.minhashSignatures(spark, docs).count())
    time("lsh_bands")(DedupOps.lshBands(spark, docs).count())
    time("lsh_candidates")(DedupOps.lshCandidates(spark, docs).count())
    spark.stop()
  }
}
