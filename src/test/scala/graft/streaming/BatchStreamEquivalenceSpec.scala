package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.ParityQueries

/** The same declarative plan must yield identical results in batch and in
  * Structured Streaming (finalized windows only — streaming append mode
  * withholds the window still open at end-of-input). This is the claim
  * that the engine is ONE plan with two execution modes, not two engines.
  */
class BatchStreamEquivalenceSpec extends AnyFunSuite with SparkSpec {

  test("flagship windowed metrics: streaming append == batch on finalized windows") {
    val sfDir = "/root/testdata/sf0.001"
    // file stream needs a directory of just the events table
    val evDir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      evDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts ships as TIMESTAMP(NANOS) (read as long) in some testdata
    // generations and naive TIMESTAMP(MICROS) (read as NTZ) in others —
    // probe the batch reader and mirror Tables.events' normalization
    val tsType = spark.read.parquet(evDir.toString).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw0 = spark.readStream.schema(schema).parquet(evDir.toString)
    val raw =
      if (tsType == LongType)
        raw0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw0.withColumn("ts", col("ts").cast(TimestampType))

    val shaped = raw.select(
      col("ts"),
      col("user_id").cast(StringType).as("station_id"),
      col("event_type").as("sensor_id"),
      when(col("event_type") === "error", lit("<<bad_data>>"))
        .otherwise(col("value").cast(StringType)).as("value_str"))
    val validated = graft.ops.SensorOps.validate(shaped, "value_str")
    val agg = validated
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("station_id"), col("sensor_id"))
      .agg(
        count(lit(1)).as("total_count"),
        sum(when(col("is_valid"), 0).otherwise(1)).as("malformed_count"),
        round(avg(when(col("is_valid"), col("value_numeric"))), 6).as("avg_value"))
      .select(col("window.end").as("window_end"), col("station_id"),
        col("sensor_id"), col("total_count"), col("malformed_count"), col("avg_value"))

    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("bs_eq").start()
    try q.processAllAvailable() finally q.stop()

    val streaming = spark.table("bs_eq").collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.toString)

    // batch reference: the registry flagship, restricted to windows the
    // watermark finalized (end <= max event time)
    val batch = ParityQueries.windowedMetrics(spark, sfDir)
    val maxTs = graft.sources.Tables.events(spark, sfDir).agg(max(col("ts"))).head().getTimestamp(0)
    val batchFinal = batch.filter(col("window_end") <= lit(maxTs))
      .select("window_end", "station_id", "sensor_id", "total_count", "malformed_count", "avg_value")
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString)

    assert(streaming.length === batchFinal.length)
    assert(streaming.toSeq === batchFinal.toSeq)
  }
}
