package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.SensorOps
import graft.sources.Tables

/** Reference-parity operator surface (SURVEY.md §2: P1–P11, A1–A6)
  * re-expressed as batch-verifiable queries over the harness `events` table.
  *
  * Role mapping (FIXTURES.md §B): `ts` ↔ event_time, `user_id` ↔ station
  * key, `event_type` ↔ sensor key, and the reference's `"<<bad_data>>"`
  * malformation (producer.py:75-77) is recreated deterministically by
  * treating `event_type = 'error'` rows as malformed payloads, so the
  * try_cast validity path is exercised end-to-end.
  *
  * Column-naming / numeric conventions shared with the DuckDB oracles:
  *  - every computed column aliased identically on both sides;
  *  - integer aggregates → BIGINT on both sides;
  *  - fractional SUMs go through DECIMAL(18,6) (exact, order-independent —
  *    a double sum is order-dependent across partitions and would make the
  *    hash compare flaky), then to double rounded to 2;
  *  - AVGs of doubles rounded to 6 (error ~1e-10, boundary-safe);
  *  - deterministic ORDER BY on both sides.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** events reshaped to the sensor wire-format semantics. */
  def sensorShaped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_id"),
      col("ts"),
      col("user_id").cast(StringType).as("station_id"),
      col("event_type").as("sensor_id"),
      when(col("event_type") === "error", lit("<<bad_data>>"))
        .otherwise(col("value").cast(StringType))
        .as("value_str"))
  }

  private def validated(spark: SparkSession, dir: String): DataFrame =
    SensorOps.validate(sensorShaped(spark, dir), "value_str")

  /** Flagship: per-station/sensor 1-minute windowed metrics with malformed
    * accounting — the reference's one aggregation (consumer.py:119-139). */
  def windowedMetrics(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir)
      .groupBy(window(col("ts"), "1 minute"), col("station_id"), col("sensor_id"))
      .agg(
        count(lit(1)).as("total_count"),
        sum(when(col("is_valid"), 0).otherwise(1)).as("malformed_count"),
        round(avg(when(col("is_valid"), col("value_numeric"))), 6).as("avg_value"),
        min(when(col("is_valid"), col("value_numeric"))).as("min_value"),
        max(when(col("is_valid"), col("value_numeric"))).as("max_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("station_id"), col("sensor_id"),
        col("total_count"), col("malformed_count"),
        col("avg_value"), col("min_value"), col("max_value"))
      .orderBy("window_start", "station_id", "sensor_id")

  private val windowedMetricsSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(user_id AS VARCHAR) AS station_id,
      |         event_type AS sensor_id,
      |         TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric
      |  FROM events)
      |SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
      |       time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) + INTERVAL '1 minute' AS window_end,
      |       station_id, sensor_id,
      |       count(*) AS total_count,
      |       CAST(sum(CASE WHEN value_numeric IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS malformed_count,
      |       round(avg(value_numeric), 6) AS avg_value,
      |       min(value_numeric) AS min_value,
      |       max(value_numeric) AS max_value
      |FROM v
      |GROUP BY 1, 2, 3, 4
      |ORDER BY window_start, station_id, sensor_id""".stripMargin

  /** P4–P6 row-level: try_cast validity + epoch-millis→timestamp
    * round-trip (consumer.py:105-116). */
  def parseValidate(spark: SparkSession, dir: String): DataFrame =
    SensorOps
      .validate(sensorShaped(spark, dir), "value_str")
      .withColumn("event_time", timestamp_millis(unix_millis(col("ts"))))
      .select("event_id", "station_id", "sensor_id", "value_numeric", "is_valid", "event_time")
      .orderBy("event_id")

  private val parseValidateSql: String =
    """SELECT event_id,
      |       CAST(user_id AS VARCHAR) AS station_id,
      |       event_type AS sensor_id,
      |       TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                     ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric,
      |       TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                     ELSE CAST(value AS VARCHAR) END AS DOUBLE) IS NOT NULL AS is_valid,
      |       make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS event_time
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** P2–P3: JSON parse with explicit schema + nested-star flatten
    * (consumer.py:100-102), over `events.props`. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), from_json(col("props"), propsSchema).as("data"))
      .select(col("event_id"), col("data.*"))
      .orderBy("event_id")

  private val jsonExtractSql: String =
    """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** P11 + K4: distinct station ids — the reference's fan-out driver query
    * (consumer.py:185). Kept fully distributed (no collect). */
  def distinctStations(spark: SparkSession, dir: String): DataFrame =
    sensorShaped(spark, dir)
      .select(col("station_id")).distinct().orderBy("station_id")

  private val distinctStationsSql: String =
    "SELECT DISTINCT CAST(user_id AS VARCHAR) AS station_id FROM events ORDER BY station_id"

  /** P10 + K5: nested-field equality filter — one station's slice of the
    * windowed metrics (consumer.py:189). */
  def stationFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = SensorOps.shapeDocument(
      validated(spark, dir)
        .groupBy(window(col("ts"), "1 minute"),
          col("station_id"), col("station_id").as("station_name"), col("sensor_id"))
        .agg(
          count(lit(1)).as("total_count"),
          sum(when(col("is_valid"), 1).otherwise(0)).as("valid_count"),
          sum(when(col("is_valid"), 0).otherwise(1)).as("malformed_count"),
          round(avg(when(col("is_valid"), col("value_numeric"))), 6).as("avg_value"),
          min(when(col("is_valid"), col("value_numeric"))).as("min_value"),
          max(when(col("is_valid"), col("value_numeric"))).as("max_value")))
    // nested-field predicate, then flatten for oracle comparability
    docs.filter(col("station.id") === lit("7"))
      .select(
        col("window.start").as("window_start"),
        col("sensor.id").as("sensor_id"),
        col("metrics.count.total").as("total_count"),
        col("metrics.count.malformed").as("malformed_count"),
        col("metrics.avg_value").as("avg_value"))
      .orderBy("window_start", "sensor_id")
  }

  private val stationFilterSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(user_id AS VARCHAR) AS station_id, event_type AS sensor_id,
      |         TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric
      |  FROM events)
      |SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
      |       sensor_id,
      |       count(*) AS total_count,
      |       CAST(sum(CASE WHEN value_numeric IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS malformed_count,
      |       round(avg(value_numeric), 6) AS avg_value
      |FROM v WHERE station_id = '7'
      |GROUP BY 1, 2
      |ORDER BY window_start, sensor_id""".stripMargin

  /** P8: the full nested output document (consumer.py:142-165, golden shape
    * docs/usage.md:119-142). Used directly by the nested-pruning ScalaTest;
    * the registered query is [[nestedDocRoundTrip]]. */
  def nestedDoc(spark: SparkSession, dir: String): DataFrame =
    SensorOps.shapeDocument(
      validated(spark, dir)
        .withColumnRenamed("sensor_id", "sensor_id_src")
        .select(
          col("ts"), col("station_id"),
          col("station_id").as("station_name"),
          col("sensor_id_src").as("sensor_id"),
          col("value_numeric"), col("is_valid"))
        .groupBy(window(col("ts"), "1 minute"),
          col("station_id"), col("station_name"), col("sensor_id"))
        .agg(
          count(lit(1)).as("total_count"),
          sum(when(col("is_valid"), 1).otherwise(0)).as("valid_count"),
          sum(when(col("is_valid"), 0).otherwise(1)).as("malformed_count"),
          avg(when(col("is_valid"), col("value_numeric"))).as("avg_value"),
          min(when(col("is_valid"), col("value_numeric"))).as("min_value"),
          max(when(col("is_valid"), col("value_numeric"))).as("max_value")))

  /** The registered `sensor_nested_doc` entry: [[nestedDoc]]'s plan with
    * every leaf projected back out as a scalar column. Nested struct
    * columns aren't comparable by the driver's pandas/DuckDB harness (r01:
    * unhashable dict on sort), so the registered output is this flattened
    * round-trip — which upgrades the entry from a rows-only check to a
    * full value oracle. The nested shape itself is asserted by ScalaTest
    * (PlanShapeSpec nested pruning + the usage.md:119-142 golden-shape
    * test). Catalyst collapses struct build + field re-extraction into one
    * projection, so this costs nothing over the flat aggregate. */
  def nestedDocRoundTrip(spark: SparkSession, dir: String): DataFrame =
    nestedDoc(spark, dir)
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("station.id").as("station_id"),
        col("station.name").as("station_name"),
        col("sensor.id").as("sensor_id"),
        col("metrics.count.total").as("total_count"),
        col("metrics.count.malformed").as("malformed_count"),
        round(col("metrics.avg_value"), 6).as("avg_value"),
        col("metrics.min_value").as("min_value"),
        col("metrics.max_value").as("max_value"))
      .orderBy("window_start", "station_id", "sensor_id")

  private val nestedDocSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(user_id AS VARCHAR) AS station_id,
      |         event_type AS sensor_id,
      |         TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric
      |  FROM events)
      |SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
      |       time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
      |       station_id,
      |       station_id AS station_name,
      |       sensor_id,
      |       count(*) AS total_count,
      |       CAST(sum(CASE WHEN value_numeric IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS malformed_count,
      |       round(avg(value_numeric), 6) AS avg_value,
      |       min(value_numeric) AS min_value,
      |       max(value_numeric) AS max_value
      |FROM v
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY window_start, station_id, sensor_id""".stripMargin

  /** A1 sliding form: the reference's window() call supports overlap
    * (consumer.py:128, WINDOW/SLIDE separately configured) though the
    * default deploy is tumbling — this exercises the sliding semantics:
    * 10-minute windows every 5 minutes, each event in exactly 2 windows. */
  def slidingMetrics(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("station_id"))
      .agg(
        count(lit(1)).as("total_count"),
        round(avg(when(col("is_valid"), col("value_numeric"))), 6).as("avg_value"))
      .select(
        col("window.start").as("window_start"),
        col("station_id"), col("total_count"), col("avg_value"))
      .orderBy("window_start", "station_id")

  private val slidingMetricsSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(user_id AS VARCHAR) AS station_id,
      |         TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric
      |  FROM events)
      |SELECT time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS window_start,
      |       station_id,
      |       count(*) AS total_count,
      |       round(avg(value_numeric), 6) AS avg_value
      |FROM v CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
      |GROUP BY 1, 2
      |ORDER BY window_start, station_id""".stripMargin

  /** SURVEY §2.7's named monitoring extension — "top sensors by avg":
    * per window, the 3 sensors with the highest average valid reading.
    * WindowGroupLimit keeps only k rows per partition pre-shuffle. */
  def topSensorsPerWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("avg_value").desc_nulls_last, col("station_id"), col("sensor_id"))
    windowedMetrics(spark, dir)
      .filter(col("avg_value").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("window_start", "rk", "station_id", "sensor_id", "avg_value")
      .orderBy("window_start", "rk")
  }

  private val topSensorsPerWindowSql: String =
    """WITH v AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(user_id AS VARCHAR) AS station_id,
      |         event_type AS sensor_id,
      |         TRY_CAST(CASE WHEN event_type = 'error' THEN '<<bad_data>>'
      |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_numeric
      |  FROM events),
      |m AS (
      |  SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
      |         station_id, sensor_id,
      |         round(avg(value_numeric), 6) AS avg_value
      |  FROM v GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT window_start, station_id, sensor_id, avg_value,
      |         row_number() OVER (PARTITION BY window_start
      |                            ORDER BY avg_value DESC, station_id, sensor_id) AS rk
      |  FROM m WHERE avg_value IS NOT NULL)
      |SELECT window_start, rk, station_id, sensor_id, avg_value
      |FROM r WHERE rk <= 3
      |ORDER BY window_start, rk""".stripMargin

  /** Batch-verifiable twin of the streaming exact dedup
    * (`dropDuplicatesWithinWatermark`, StreamingDedupSpec): at-least-once
    * redelivery is simulated deterministically (every 7th event arrives
    * twice), then `dropDuplicates` on the reading identity
    * (station, sensor, ts) restores exactly-once before the windowed
    * count. Output uses only key columns, so the arbitrary-row-per-key
    * semantics of dropDuplicates cannot leak nondeterminism into the
    * oracle compare. Scale shape: one hash-shuffle on the dedup key —
    * identical to dedup_exact; the streaming form bounds the same state
    * by watermark instead of corpus size. */
  def dedupReplay(spark: SparkSession, dir: String): DataFrame = {
    val v = sensorShaped(spark, dir)
    val replayed = v.unionAll(v.filter(pmod(col("event_id"), lit(7)) === 0))
    replayed
      .dropDuplicates(Seq("station_id", "sensor_id", "ts"))
      .groupBy(window(col("ts"), "1 minute"), col("station_id"))
      .agg(
        count(lit(1)).as("n_readings"),
        countDistinct(col("sensor_id")).as("n_sensors"))
      .select(
        col("window.start").as("window_start"),
        col("station_id"), col("n_readings"), col("n_sensors"))
      .orderBy("window_start", "station_id")
  }

  private val dedupReplaySql: String =
    """WITH raw AS (
      |  SELECT CAST(user_id AS VARCHAR) AS station_id,
      |         event_type AS sensor_id,
      |         CAST(ts AS TIMESTAMP) AS ts
      |  FROM events
      |  UNION ALL
      |  SELECT CAST(user_id AS VARCHAR), event_type, CAST(ts AS TIMESTAMP)
      |  FROM events WHERE event_id % 7 = 0),
      |d AS (SELECT DISTINCT station_id, sensor_id, ts FROM raw)
      |SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
      |       station_id,
      |       CAST(count(*) AS BIGINT) AS n_readings,
      |       CAST(count(DISTINCT sensor_id) AS BIGINT) AS n_sensors
      |FROM d GROUP BY 1, 2
      |ORDER BY window_start, station_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "sensor_dedup_replay"     -> (dedupReplay _),
    "top_sensors_per_window"  -> (topSensorsPerWindow _),
    "sensor_sliding_metrics"  -> (slidingMetrics _),
    "sensor_windowed_metrics" -> (windowedMetrics _),
    "sensor_parse_validate"   -> (parseValidate _),
    "sensor_json_extract"     -> (jsonExtract _),
    "sensor_distinct_stations" -> (distinctStations _),
    "sensor_station_filter"   -> (stationFilter _),
    "sensor_nested_doc"       -> (nestedDocRoundTrip _))

  val oracle: Map[String, String] = Map(
    "sensor_dedup_replay"      -> dedupReplaySql,
    "top_sensors_per_window"   -> topSensorsPerWindowSql,
    "sensor_sliding_metrics"   -> slidingMetricsSql,
    "sensor_windowed_metrics"  -> windowedMetricsSql,
    "sensor_parse_validate"    -> parseValidateSql,
    "sensor_json_extract"      -> jsonExtractSql,
    "sensor_distinct_stations" -> distinctStationsSql,
    "sensor_station_filter"    -> stationFilterSql,
    "sensor_nested_doc"        -> nestedDocSql)
}
