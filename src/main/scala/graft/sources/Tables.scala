package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet batch access to the harness testdata (TESTDATA.md).
  *
  * The reference ingests from Kafka (`/root/reference/spark-app/consumer.py:83-90`);
  * in this engine the batch-verifiable source is parquet, and the streaming
  * path (graft.streaming) reuses the same downstream plan over file /
  * MemoryStream sources. Reading with `spark.read.parquet` keeps column
  * pruning + filter pushdown available to Catalyst — at 100 TB the scan is
  * the dominant cost and pruning/pushdown are the first-order optimizations.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as long nanos (legacy conf, set at runtime so any
    * caller-provided session works) and convert to TimestampType with
    * exact integer division — `ts div 1000` on longs; a double division
    * would lose precision above 2^53 ns (~1970+104 days).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
}
