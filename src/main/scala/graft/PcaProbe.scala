package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe adjudicating the PCA moment-pass shape (r6): the
  * double-posexplode (N·d² narrow rows into a 4096-key partial agg) vs
  * the per-vector Gram-row fold (N·d rows carrying a d-array of
  * products, 64 per-column sums). Both produce identical exact
  * integers; this measures which one the engine actually executes
  * faster at K× corpus scale. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val scaled = (0 until k).map(_ => emb.select(col("embedding")))
      .reduce(_ unionAll _).repartition(32)
    val mvec = scaled.select(
      transform(col("embedding"), x => round(x * 1e6).cast("long")).as("m"))
      .cache()
    println(s"[probe] vectors: ${mvec.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }

    (1 to 2).foreach { pass =>
      time(s"posexplode2 pass$pass") {
        mvec.select(col("m"), posexplode(col("m")).as(Seq("i", "xi")))
          .select(col("i"), col("xi"), posexplode(col("m")).as(Seq("j", "xj")))
          .groupBy(col("i"), col("j"))
          .agg(sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("sxx"))
          .count()
      }
      time(s"gram_fold pass$pass") {
        val gram = mvec
          .select(posexplode(col("m")).as(Seq("i", "xi")), col("m"))
          .select(col("i"),
            transform(col("m"), xj => (col("xi") * xj).cast("decimal(38,0)")).as("p"))
        gram.groupBy(col("i")).agg(
          sum(element_at(col("p"), 1)).as("s0"),
          (1 until 64).map(j => sum(element_at(col("p"), j + 1)).as(s"s$j")): _*)
          .count()
      }
      time(s"gram_long_fold pass$pass") {
        // long array + cast at the sum: cheaper element type, same values
        val gram = mvec
          .select(posexplode(col("m")).as(Seq("i", "xi")), col("m"))
          .select(col("i"), transform(col("m"), xj => col("xi") * xj).as("p"))
        gram.groupBy(col("i")).agg(
          sum(element_at(col("p"), 1).cast("decimal(38,0)")).as("s0"),
          (1 until 64).map(j =>
            sum(element_at(col("p"), j + 1).cast("decimal(38,0)")).as(s"s$j")): _*)
          .count()
      }
    }
    (1 to 2).foreach { pass =>
      time(s"pcaMomentFrom pass$pass")(
        graft.queries.SimilarityQueries.pcaMomentFrom(spark, scaled).count())
    }
    // stage-by-stage breakdown of the moment build
    (1 to 2).foreach { pass =>
      val mv = scaled.select(
        transform(col("embedding"), x => round(x * 1e6).cast("long")).as("m"))
        .localCheckpoint(false)
      time(s"stage_checkpoint pass$pass")(mv.count())
      val gram = mv
        .select(posexplode(col("m")).as(Seq("i", "xi")), col("m"))
        .select(col("i"),
          transform(col("m"), xj => (col("xi") * xj).cast("decimal(38,0)")).as("p"))
      val sums = gram.groupBy(col("i")).agg(
        sum(element_at(col("p"), 1)).as("s0"),
        (1 until 64).map(j => sum(element_at(col("p"), j + 1)).as(s"s$j")): _*)
      time(s"stage_gram_agg pass$pass")(sums.count())
      val op = sums.select(col("i"),
        posexplode(array((0 until 64).map(j => col(s"s$j")): _*)).as(Seq("j", "sxx")))
      val sx = mv.select(posexplode(col("m")).as(Seq("i", "xi")))
        .groupBy(col("i")).agg(sum(col("xi").cast("decimal(38,0)")).as("sx"))
      val nRow = mv.agg(count(lit(1)).as("n"))
      val a = op.join(broadcast(sx.select(col("i"), col("sx").as("sx_i"))), "i")
        .join(broadcast(sx.select(col("i").as("j"), col("sx").as("sx_j"))), "j")
        .crossJoin(broadcast(nRow))
        .select(col("i"), col("j"),
          (col("n") * col("sxx") - col("sx_i") * col("sx_j")).as("a"))
      time(s"stage_joins pass$pass")(a.count())
      time(s"stage_a_checkpoint pass$pass")(a.localCheckpoint(false).count())
    }
    spark.stop()
  }
}
