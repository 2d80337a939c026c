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

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (Spark 4 rejects NANOS by default — read as long nanos
    * via the legacy conf and convert with exact integer division: `ts div
    * 1000` on longs, since a double division would lose precision above
    * 2^53 ns) and as naive TIMESTAMP(MICROS) in others (read as
    * TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default). Branch on
    * the type actually read and normalize BOTH to TimestampType (LTZ) —
    * the type the nanos path always produced — so every downstream
    * consumer (windows, watermarks, the DuckDB-oracle output encoding)
    * sees one stable type regardless of which generation is on disk;
    * under the fixed UTC session the NTZ→LTZ cast is value-identity.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
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
