package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ParityQueries, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one aggregation: per-station/sensor windowed metrics
    * with malformed accounting (consumer.py:119-139). */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.windowedMetrics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracle
}
