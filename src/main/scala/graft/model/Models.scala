package graft.model

import java.sql.Timestamp

/** Typed boundary models for the sensor pipeline (SURVEY.md §1.2).
  *
  * `SensorReading` mirrors SENSOR_SCHEMA at
  * `/root/reference/spark-app/consumer.py:39-45`: all-string payload except
  * the epoch-millis timestamp; `value` is either numeric text or the
  * malformed marker `"<<bad_data>>"`.
  */
case class SensorReading(
    station_name: String,
    station_id: String,
    sensor_id: String,
    timestamp: Long, // epoch millis (producer.py:73)
    value: String)

/** Post-validation row (consumer.py:93-116 equivalent). */
case class ValidatedReading(
    station_name: String,
    station_id: String,
    sensor_id: String,
    timestamp: Long,
    value: String,
    value_numeric: Option[Double],
    is_valid: Boolean,
    event_time: Timestamp)

/** Flat windowed aggregate (consumer.py:119-139 equivalent). */
case class WindowedMetrics(
    window_start: Timestamp,
    window_end: Timestamp,
    station_id: String,
    station_name: String,
    sensor_id: String,
    total_count: Long,
    malformed_count: Long,
    avg_value: Option[Double],
    min_value: Option[Double],
    max_value: Option[Double])

object SensorReading {
  /** The malformed marker the producer injects (~5% of payloads,
    * `/root/reference/simulator/producer.py:75-77`). */
  val BadData = "<<bad_data>>"
}
