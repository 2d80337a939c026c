package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity sensor transforms (SURVEY.md §2), shared by the batch
  * queries (graft.queries) and the streaming pipeline (graft.streaming).
  *
  * Everything here is `org.apache.spark.sql.functions` (codegen'd, shuffle
  * declared, Catalyst-optimizable) — no UDFs, no driver-side loops. That is
  * the scale story: at 100 TB the windowed aggregate below is a single
  * hash-aggregate with map-side partial aggregation, shuffling only
  * (window, station, sensor) partials, not raw rows.
  */
object SensorOps {

  /** SENSOR_SCHEMA, `/root/reference/spark-app/consumer.py:39-45`. */
  val sensorSchema: StructType = StructType(Seq(
    StructField("station_name", StringType),
    StructField("station_id", StringType),
    StructField("sensor_id", StringType),
    StructField("timestamp", LongType), // epoch millis
    StructField("value", StringType)))

  /** P1–P3 (consumer.py:100-102): raw bytes/string → JSON parse with an
    * explicit schema → flattened columns. Schema is never inferred: at scale
    * schema inference is a full extra pass over the data.
    */
  def parseJson(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(valueCol).cast(StringType), sensorSchema).as("data"))
      .select(col("data.*"))

  /** P4–P6 (consumer.py:105-116): validity via try_cast + epoch-ms
    * conversion.
    *
    * THE portability trap (SURVEY.md §1.2): the reference runs Spark 3.5
    * with ANSI off, where `cast("double")` yields NULL on `"<<bad_data>>"`;
    * Spark 4 defaults ANSI on and the same cast throws. `try_cast`
    * reproduces the reference semantics exactly: NULL on failure drives
    * `is_valid`, the malformed count, and exclusion from min/max/avg.
    */
  def validate(parsed: DataFrame, valueCol: String = "value"): DataFrame =
    parsed
      .withColumn("value_numeric", try_cast(col(valueCol), "double"))
      .withColumn("is_valid", col("value_numeric").isNotNull)

  /** consumer.py:115 — epoch **millis** / 1000 → timestamp, sub-second
    * precision preserved. `timestamp_millis` is the exact builtin. */
  def withEventTime(df: DataFrame, millisCol: String = "timestamp"): DataFrame =
    df.withColumn("event_time", timestamp_millis(col(millisCol)))

  /** `try_cast` as a Column helper (Spark 4 exposes it only as SQL/`Column`
    * method in some minors; `expr` keeps us version-proof). */
  def try_cast(c: Column, to: String): Column =
    c.try_cast(to)

  /** A1–A6 (consumer.py:119-139): windowed multi-key conditional aggregate.
    *
    * - `total_count` counts ALL rows including malformed (A3).
    * - `valid_count` is computed by the reference but never emitted
    *   (consumer.py:144-165) — we keep it in the flat row; Shaping drops it.
    * - avg/min/max see only valid rows via `when(is_valid, x)` — the
    *   NULL-skipping semantics of Spark aggregates do the filtering (A4–A6),
    *   so an all-malformed group yields NULL metrics, matching the
    *   reference.
    *
    * One shuffle on the grouping keys with partial aggregation map-side;
    * this is the plan shape that survives a 1000-executor scale-up.
    */
  def windowedMetrics(
      validated: DataFrame,
      timeCol: Column,
      keys: Seq[Column],
      windowDuration: String = "1 minute",
      slideDuration: Option[String] = None): DataFrame = {
    val win = slideDuration match {
      case Some(s) => window(timeCol, windowDuration, s)
      case None    => window(timeCol, windowDuration)
    }
    val validVal = when(col("is_valid"), col("value_numeric"))
    validated
      .groupBy(win +: keys: _*)
      .agg(
        count(lit(1)).as("total_count"),
        sum(when(col("is_valid"), 1).otherwise(0)).as("valid_count"),
        sum(when(col("is_valid"), 0).otherwise(1)).as("malformed_count"),
        avg(validVal).as("avg_value"),
        min(validVal).as("min_value"),
        max(validVal).as("max_value"))
  }

  /** P8 (consumer.py:142-165): flat aggregate row → nested output document
    * `{window:{start,end}, station:{id,name}, sensor:{id}, metrics:{...,
    * count:{total,malformed}}}`. Golden example:
    * `/root/reference/docs/usage.md:119-142`. `valid_count` is dropped here,
    * exactly as the reference never selects it.
    */
  def shapeDocument(agg: DataFrame): DataFrame =
    agg.select(
      struct(
        col("window.start").as("start"),
        col("window.end").as("end")).as("window"),
      struct(
        col("station_id").as("id"),
        col("station_name").as("name")).as("station"),
      struct(col("sensor_id").as("id")).as("sensor"),
      struct(
        col("min_value"),
        col("max_value"),
        col("avg_value"),
        struct(
          col("total_count").as("total"),
          col("malformed_count").as("malformed")).as("count")).as("metrics"))
}
