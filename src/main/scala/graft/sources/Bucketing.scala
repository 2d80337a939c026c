package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables by their join key once
  * at write time so every subsequent equi-join/aggregation on that key is
  * co-located — zero Exchange in the plan.
  *
  * This is the highest-leverage layout decision at 100 TB: a recurring
  * lineitem⋈orders join pays one shuffle per query unbucketed, zero when
  * both sides are bucketed by the key into the same bucket count. */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket the two big fact tables by order key. */
  def bucketFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_b", "l_orderkey", buckets)
    writeBucketed(Tables.orders(spark, dir), "orders_b", "o_orderkey", buckets)
  }
}
