package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Per-source LIVENESS heartbeats — the deployable recovery for the
  * idle-partition watermark stall (r13, VERDICT #4; the stall itself is
  * pinned by `StalledPartitionWatermarkSpec`): Spark combines
  * multi-source watermarks with `multipleWatermarkPolicy = min` (the
  * default, and the only correctness-safe policy), so ONE quiet source
  * freezes append-mode emission for the whole query, and Spark ships no
  * idle-source timeout that excludes it (`max` trades the stall for
  * silent late-drop of the idle source's backlog). The production
  * convention is synthetic per-source heartbeat rows: the ingest side
  * emits one periodically into each quiet source, the query side strips
  * them before any aggregate. This object makes the convention a tested
  * utility instead of prose — [[emit]] builds the liveness row,
  * [[strip]] is the downstream filter, and the spec proves windows
  * close through a quiet source with ZERO heartbeat rows leaking into
  * the output.
  *
  * Marker convention: heartbeats carry [[Marker]] in one designated
  * STRING column of the source schema (any column the pipeline treats
  * as an identifier works — the reference's wire rows would use
  * `station_name`). Every other column is null; the event-time column
  * carries the source's current clock, which is the entire point — the
  * row exists only to advance that source's watermark. [[strip]] uses
  * null-safe equality, so genuine rows with a NULL marker column are
  * kept (a malformed data row must not be mistaken for a heartbeat). */
object Heartbeats {

  /** The reserved marker value. Contains a character no tokenizer or
    * producer emits in an identifier, so a genuine row can never
    * collide with it. */
  val Marker = "graft.heartbeat"

  /** One heartbeat row against `schema`: `tsCol` = `atMs` (the emitting
    * source's current clock), `markerCol` = [[Marker]], every other
    * column null. Fails loudly on a schema whose tsCol is not a
    * timestamp or whose markerCol cannot hold the marker — a silently
    * malformed heartbeat would be dropped by the source parser and the
    * stall would persist while the ingest believes it is heartbeating. */
  def emit(spark: SparkSession, schema: StructType, tsCol: String,
      markerCol: String, atMs: Long): DataFrame = {
    require(schema.fieldNames.contains(tsCol) && schema.fieldNames.contains(markerCol),
      s"schema has no $tsCol/$markerCol: ${schema.fieldNames.mkString(",")}")
    require(schema(tsCol).dataType == TimestampType,
      s"$tsCol is ${schema(tsCol).dataType}, not TIMESTAMP — the heartbeat " +
        "exists to advance event time and must land in the watermark column")
    require(schema(markerCol).dataType.typeName == "string",
      s"$markerCol is ${schema(markerCol).dataType}, cannot hold the marker")
    val row = Row.fromSeq(schema.fields.map { f =>
      if (f.name == tsCol) new java.sql.Timestamp(atMs)
      else if (f.name == markerCol) Marker
      else null
    }.toSeq)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
  }

  /** [[emit]] appended to a file-source directory (the proxy this
    * sandbox can run; a Kafka deployment produces the same row to the
    * idle partition instead). One single-row file per call — exactly
    * what a liveness cron writes. */
  def emitToDir(spark: SparkSession, dir: String, schema: StructType,
      tsCol: String, markerCol: String, atMs: Long): Unit =
    emit(spark, schema, tsCol, markerCol, atMs)
      .coalesce(1).write.mode("append").parquet(dir)

  /** The downstream filter: drops rows whose `markerCol` IS the marker
    * (null-safe — a genuine row with a NULL marker column is kept).
    * Apply after `withWatermark`, BEFORE any aggregate, so heartbeats
    * advance the watermark but never count; the spec asserts the
    * released windows' counts equal the data-only counts.
    *
    * THE PUSHDOWN TRAP (why `tsCol` is a parameter): the watermark
    * advances from event times observed at the `EventTimeWatermark`
    * node, and Catalyst's `PushPredicateThroughNonJoin` pushes any
    * deterministic predicate that does not reference the event-time
    * column BELOW that node — all the way into the parquet/Kafka scan.
    * A marker-only filter therefore removes the heartbeat BEFORE the
    * watermark node ever sees it, and the stall this utility exists to
    * fix quietly persists (measured: the spec's released-window leg
    * froze exactly like the no-heartbeat phase). Referencing `tsCol`
    * in the predicate pins the filter above the watermark node; the
    * `isNull` disjunct is vacuously false for heartbeats (their ts is
    * the whole point) and keeps null-ts data rows a marker-only filter
    * would keep too.
    *
    * ORDERING GUARD (r14, ADVICE): the anti-pushdown protection only
    * works when strip is applied AFTER `withWatermark` — applied
    * before it, the filter sits below the later-added watermark node
    * by construction and the stall silently persists, the exact
    * failure this utility exists to prevent. A streaming input whose
    * analyzed plan carries no `EventTimeWatermark` node ON `tsCol` is
    * therefore refused loudly instead of guarded by prose — matching
    * the node's event-time attribute against the passed column (r15,
    * ADVICE: an any-node existence check passed a union whose OTHER
    * branch was watermarked on a different column while the stall
    * persisted on this one). Batch frames (the parity legs) carry no
    * watermark node and are exempt. The guard is still a HEURISTIC on
    * multi-branch frames: a union with one branch watermarked on
    * `tsCol` and another unwatermarked passes, because the analyzed
    * tree cannot say which branch this strip's filter will land on —
    * the per-branch convention is to strip each source before the
    * union. */
  def strip(df: DataFrame, markerCol: String, tsCol: String): DataFrame = {
    require(!df.isStreaming || df.queryExecution.analyzed.exists {
        case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
          w.eventTime.name.equalsIgnoreCase(tsCol)
        case _ => false
      },
      s"Heartbeats.strip applied to a streaming frame with no EventTimeWatermark " +
        s"on '$tsCol' below it — call strip AFTER withWatermark($tsCol, ...), or " +
        "the heartbeat is filtered before the watermark node observes it and the " +
        "stall persists")
    df.filter(!(col(markerCol) <=> lit(Marker)) || col(tsCol).isNull)
  }
}
