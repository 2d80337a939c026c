package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for plan-shape review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary", "revenue_by_nation", "top_customers")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_EXPLAIN_FULL=1: audit-form plans (materialization off), so the
    // formatted output shows the full lineage instead of truncating at
    // every eager localCheckpoint boundary — the r15 plans/ deliverable.
    if (sys.env.get("GRAFT_EXPLAIN_FULL").contains("1"))
      sys.props("graft.materialize") = "off"
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
