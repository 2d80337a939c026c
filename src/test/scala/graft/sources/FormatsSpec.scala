package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Source/sink format breadth beyond parquet: JSON (the reference's wire
  * format — consumer.py parses JSON payloads), CSV with header, and ORC.
  * Every read uses an EXPLICIT schema: at scale, schema inference is a
  * full extra pass over the data (SURVEY §2.2 P2 note), so the engine's
  * contract is schema-first for every format. */
class FormatsSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def sample = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("event_type"), col("value"))

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)),
      sum(col("event_id")) + sum(col("value").cast("decimal(18,6)")).cast("long"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("JSON round-trip with explicit schema") {
    val dir = Files.createTempDirectory("fmt_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.schema === schema)
    assert(checksum(back) === checksum(sample))
  }

  test("CSV round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema === schema)
    assert(checksum(back) === checksum(sample))
  }

  test("ORC round-trip") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(checksum(back) === checksum(sample))
  }

  test("parquet schema evolution: added column merges, old rows read null") {
    // the lake-lifecycle case: an ingest adds a column mid-stream; readers
    // with mergeSchema see the union schema, pre-evolution rows get nulls
    val dir = Files.createTempDirectory("fmt_evolve").toString
    sample.limit(100).write.mode("append").parquet(dir)
    sample.limit(50).withColumn("quality", lit(0.9)).write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.contains("quality"))
    assert(merged.count() === 150)
    assert(merged.filter(col("quality").isNull).count() === 100)
    assert(merged.filter(col("quality").isNotNull).count() === 50)
  }

  test("malformed JSON rows surface as nulls under PERMISSIVE, not crashes") {
    // the reference's 5% "<<bad_data>>" story at the format layer:
    // a corrupt line must not kill a 100 TB ingest job
    val dir = Files.createTempDirectory("fmt_bad").toString
    Files.writeString(java.nio.file.Path.of(dir, "part-0.json"),
      Seq(
        """{"event_id": 1, "event_type": "click", "value": 2.5}""",
        """not json at all""",
        """{"event_id": 2, "event_type": "view", "value": 1.0}""").mkString("\n"))
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() === 3)
    assert(back.filter(col("event_id").isNull).count() === 1)
    assert(back.filter(col("event_id").isNotNull).count() === 2)
  }
}
