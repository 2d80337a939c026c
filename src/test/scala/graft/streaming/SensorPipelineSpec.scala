package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.SensorReading

/** Streaming semantics the DuckDB oracle cannot cover (SURVEY.md §5):
  * watermark late-data drop (W1), append-mode single emission (W6),
  * all-malformed groups, and the golden nested document shape
  * (/root/reference/docs/usage.md:119-142).
  */
class SensorPipelineSpec extends AnyFunSuite with SparkSpec {

  // t0 on a 10s window boundary
  private val t0 = 1700000000000L

  private def startPipeline(queryName: String)
      : (MemoryStream[SensorReading], StreamingQuery) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SensorReading]
    val raw = input.toDS().select(
      to_json(struct(col("station_name"), col("station_id"), col("sensor_id"),
        col("timestamp"), col("value"))).as("value"))
    val q = SensorPipeline
      .documents(raw, watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    (input, q)
  }

  private def r(sensor: String, offsetMs: Long, value: String,
      station: String = "perugia", stationName: String = "Perugia") =
    SensorReading(stationName, station, sensor, t0 + offsetMs, value)

  test("windowed metrics: malformed accounting, append emission, late-data drop") {
    val (input, q) = startPipeline("docs")
    try {
      // window [t0, t0+10s): 2 valid + 1 malformed for sensor 1
      input.addData(r("1", 1000, "10.0"), r("1", 2000, "20.0"), r("1", 3000, "<<bad_data>>"))
      q.processAllAvailable()
      // nothing emitted yet: watermark has not passed window end
      assert(spark.table("docs").count() === 0)

      // advance watermark beyond t0+15s => first window finalizes
      input.addData(r("1", 30000, "42.0"))
      q.processAllAvailable()
      val out1 = spark.table("docs").collect()
      assert(out1.length === 1)
      val row = spark.table("docs")
        .select(col("station.id"), col("station.name"), col("sensor.id"),
          col("metrics.count.total"), col("metrics.count.malformed"),
          col("metrics.avg_value"), col("metrics.min_value"), col("metrics.max_value"))
        .head()
      assert(row.getString(0) === "perugia")
      assert(row.getString(1) === "Perugia")
      assert(row.getString(2) === "1")
      assert(row.getLong(3) === 3L)   // total counts malformed too
      assert(row.getLong(4) === 1L)
      assert(row.getDouble(5) === 15.0) // avg over valid only
      assert(row.getDouble(6) === 10.0)
      assert(row.getDouble(7) === 20.0)

      // late row for the finalized window: dropped, no re-emission
      input.addData(r("1", 4000, "99.0"))
      q.processAllAvailable()
      assert(spark.table("docs").count() === 1)

      // close the second window; late row must not have resurrected state
      input.addData(r("1", 60000, "1.0"))
      q.processAllAvailable()
      val all = spark.table("docs")
        .select(col("metrics.count.total")).collect().map(_.getLong(0)).sorted
      assert(all.toSeq === Seq(1L, 3L)) // [t0+30,+40): the advancer; [t0,+10): 3
    } finally q.stop()
  }

  test("all-malformed group yields NULL metrics and malformed == total") {
    val (input, q) = startPipeline("docs_bad")
    try {
      input.addData(r("2", 1000, "<<bad_data>>"), r("2", 2000, "<<bad_data>>"))
      input.addData(r("2", 30000, "5.0")) // watermark advancer
      q.processAllAvailable()
      val row = spark.table("docs_bad")
        .where(col("sensor.id") === "2" && col("metrics.count.total") === 2)
        .select(col("metrics.avg_value"), col("metrics.min_value"),
          col("metrics.max_value"), col("metrics.count.malformed"))
        .head()
      assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
      assert(row.getLong(3) === 2L)
    } finally q.stop()
  }

  test("golden document shape matches the reference output contract") {
    val (input, q) = startPipeline("docs_shape")
    try {
      input.addData(r("1", 1000, "40.1"))
      input.addData(r("1", 30000, "45.2"))
      q.processAllAvailable()
      val schema = spark.table("docs_shape").schema
      assert(schema.fieldNames.toSeq === Seq("window", "station", "sensor", "metrics"))
      val metrics = schema("metrics").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(metrics.fieldNames.toSeq === Seq("min_value", "max_value", "avg_value", "count"))
      val cnt = metrics("count").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(cnt.fieldNames.toSeq === Seq("total", "malformed"))
    } finally q.stop()
  }

  test("try_cast validity: the ANSI cast trap regression") {
    import spark.implicits._
    val df = Seq("42.5", "<<bad_data>>", "", "1e3", "nan").toDF("value")
    val out = graft.ops.SensorOps.validate(df, "value")
      .select("value", "is_valid").collect()
      .map(x => x.getString(0) -> x.getBoolean(1)).toMap
    assert(out("42.5"))
    assert(!out("<<bad_data>>"))
    assert(!out(""))
    assert(out("1e3"))
    assert(out("nan")) // Spark parses "nan" as Double.NaN — documented quirk
  }
}
