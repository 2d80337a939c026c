package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** The reference's tunable surface (`/root/reference/.env:13-17` →
  * consumer.py via env): window, slide, watermark, trigger, checkpoint.
  * Typed here, with the same environment-variable contract honored so a
  * MASD deployment's configuration carries over unchanged.
  */
case class PipelineConfig(
    windowDuration: String = "1 minute",   // SPARK_AGGREGATE_WINDOW (.env:14)
    slideDuration: Option[String] = None,  // SPARK_AGGREGATE_SLIDE (.env:15; None = tumbling)
    watermarkDelay: String = "5 seconds",  // SPARK_AGGREGATE_WATERMARK (.env:16)
    triggerInterval: String = "1 minute",  // SPARK_AGGREGATE_TRIGGER_INTERVAL (.env:13)
    checkpointDir: String = "/tmp/graft-checkpoint", // SPARK_AGGREGATE_CHECKPOINT_DIR (.env:17)
    kafkaBootstrapServers: Option[String] = None,    // KAFKA_BOOTSTRAP_SERVERS (.env:2)
    kafkaTopicPrefix: String = "sensors.raw") {      // KAFKA_TOPIC_PREFIX (.env:7)

  def trigger: Trigger = Trigger.ProcessingTime(triggerInterval)
}

object PipelineConfig {

  /** Read the reference's env-var contract (`SPARK_AGGREGATE_*`, .env:13-17
    * — the names consumer.py:31-35 reads via os.getenv), defaulting like
    * the reference compose stack. The short names (WINDOW_DURATION etc.,
    * consumer.py's internal Python variable names) are honored as a
    * fallback for convenience. The reference's .env ships SLIDE equal to
    * WINDOW (tumbling); an equal slide is normalized to None. */
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig = {
    def get(primary: String, fallback: String, default: String): String =
      env.get(primary).orElse(env.get(fallback)).getOrElse(default)
    val window = get("SPARK_AGGREGATE_WINDOW", "WINDOW_DURATION", "1 minute")
    PipelineConfig(
      windowDuration = window,
      slideDuration = env.get("SPARK_AGGREGATE_SLIDE").orElse(env.get("SLIDE_DURATION"))
        .filter(s => s.nonEmpty && s != window),
      watermarkDelay = get("SPARK_AGGREGATE_WATERMARK", "WATERMARK_DELAY", "5 seconds"),
      triggerInterval = get("SPARK_AGGREGATE_TRIGGER_INTERVAL", "TRIGGER_INTERVAL", "1 minute"),
      checkpointDir = get("SPARK_AGGREGATE_CHECKPOINT_DIR", "CHECKPOINT_DIR", "/tmp/graft-checkpoint"),
      kafkaBootstrapServers = env.get("KAFKA_BOOTSTRAP_SERVERS").filter(_.nonEmpty),
      // empty-filtered like the servers: "" + ".*" would silently
      // subscribe to EVERY topic on the broker
      kafkaTopicPrefix = env.get("KAFKA_TOPIC_PREFIX").filter(_.nonEmpty)
        .getOrElse("sensors.raw"))
  }
}
