package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL front door: register the testdata tables as temp views so the whole
  * engine surface is reachable from `spark.sql(...)` — the batch tables
  * under their canonical names plus curated derived views. */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      (if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t))
        .createOrReplaceTempView(t)
    }
  }

  /** Derived views: the cleaned corpus and the flagship windowed metrics,
    * queryable as plain SQL relations. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    graft.queries.PipelineQueries.cleanCorpus(spark, dir)
      .createOrReplaceTempView("clean_corpus")
    graft.queries.ParityQueries.windowedMetrics(spark, dir)
      .createOrReplaceTempView("sensor_windowed_metrics")
  }
}
