package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** The reference's tunable surface (`/root/reference/.env:13-17` →
  * consumer.py via env): window, slide, watermark, trigger, checkpoint.
  * Typed here, with the same environment-variable contract honored so a
  * MASD deployment's configuration carries over unchanged.
  */
case class PipelineConfig(
    windowDuration: String = "1 minute",   // WINDOW_DURATION (.env:14)
    slideDuration: Option[String] = None,  // SLIDE_DURATION (.env:15; None = tumbling)
    watermarkDelay: String = "5 seconds",  // WATERMARK_DELAY (.env:16)
    triggerInterval: String = "1 minute",  // TRIGGER_INTERVAL (.env:13)
    checkpointDir: String = "/tmp/graft-checkpoint") { // CHECKPOINT_DIR (.env:17)

  def trigger: Trigger = Trigger.ProcessingTime(triggerInterval)
}

object PipelineConfig {

  /** Read the reference's env-var contract, defaulting like the reference
    * compose stack. */
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig =
    PipelineConfig(
      windowDuration = env.getOrElse("WINDOW_DURATION", "1 minute"),
      slideDuration = env.get("SLIDE_DURATION")
        .filter(s => s.nonEmpty && s != env.getOrElse("WINDOW_DURATION", "1 minute")),
      watermarkDelay = env.getOrElse("WATERMARK_DELAY", "5 seconds"),
      triggerInterval = env.getOrElse("TRIGGER_INTERVAL", "1 minute"),
      checkpointDir = env.getOrElse("CHECKPOINT_DIR", "/tmp/graft-checkpoint"))
}
