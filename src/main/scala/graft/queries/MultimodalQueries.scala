package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal tier: binary-column feature extraction and frame-sampling
  * row accounting, oracle-checked. Frame *bytes* are covered by ScalaTest
  * (MultimodalSpec) — DuckDB verifies the schema/row/count plumbing, which
  * is the part that must be right at scale.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Binary features over the documents-backed media table. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.binaryFeatures(
      Multimodal.fromDocuments(Tables.documents(spark, dir)))
      .orderBy("media_id")

  private val mediaFeaturesSql: String =
    s"""SELECT doc_id AS media_id,
       |       'text/plain' AS kind,
       |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |       sha256(text) AS sha256,
       |       hex(encode(substring(text, 1, 8))) AS head_hex,
       |       CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / ${Multimodal.FrameBytes}) AS INT) AS n_frames
       |FROM documents ORDER BY media_id""".stripMargin

  /** Frame-sampling accounting: frames per media after keeping every 4th —
    * the distributed row-fanout logic of the decode path, without bytes. */
  def frameSampleCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.fromDocuments(Tables.documents(spark, dir))
      .as[Multimodal.MediaRow]
    Multimodal.sampleFrames(spark, media, everyN = 4)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).cast("bigint").as("n_sampled"))
      .orderBy("media_id")
  }

  private val frameSampleCountsSql: String =
    s"""SELECT doc_id AS media_id,
       |       CAST(ceil(CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / ${Multimodal.FrameBytes}) AS DOUBLE) / 4) AS BIGINT) AS n_sampled
       |FROM documents
       |WHERE octet_length(encode(text)) > 0
       |ORDER BY media_id""".stripMargin

  /** Resize planning over the media table: aspect-fit into a 256 box,
    * no upscaling. The double arithmetic (division, multiply, floor) is
    * identical on both engines, so the plan is exactly oracle-checkable. */
  def mediaResizePlan(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
      Multimodal.fromDocuments(Tables.documents(spark, dir)))
      .orderBy("media_id")

  private val mediaResizePlanSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |         CAST(CASE WHEN doc_id % 5 = 4 THEN 200
      |                   ELSE 320 + (doc_id % 5) * 160 END AS DOUBLE) AS w,
      |         CAST(CASE WHEN doc_id % 5 = 4 THEN 150
      |                   ELSE 240 + (doc_id % 3) * 120 END AS DOUBLE) AS h
      |  FROM documents),
      |s AS (SELECT media_id, w, h, least(256.0 / w, 256.0 / h, 1.0) AS scale FROM m)
      |SELECT media_id,
      |       CAST(w AS INT) AS width,
      |       CAST(h AS INT) AS height,
      |       CAST(floor(w * scale) AS INT) AS out_w,
      |       CAST(floor(h * scale) AS INT) AS out_h,
      |       scale < 1.0 AS scaled
      |FROM s ORDER BY media_id""".stripMargin

  /** Media-level exact dedup — the binary twin of `dedup_exact`: opaque
    * blobs grouped by content sha256 (no decode needed), minimum
    * media_id survives. One hash-shuffle on the digest; at 100 TB this
    * is the first pass of any image/audio corpus ingest, and the digest
    * doubles as the content-addressed storage key. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.fromDocuments(Tables.documents(spark, dir))
      .groupBy(sha2(col("content"), 256).as("sha256"))
      .agg(
        min(col("media_id")).as("keep_media_id"),
        count(lit(1)).as("n_copies"),
        max(octet_length(col("content"))).as("n_bytes"))
      .orderBy("sha256")

  private val mediaDedupSql: String =
    """SELECT sha256(text) AS sha256,
      |       min(doc_id) AS keep_media_id,
      |       count(*) AS n_copies,
      |       CAST(max(octet_length(encode(text))) AS INT) AS n_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY sha256""".stripMargin

  val queries: Map[String, Q] = Map(
    "media_dedup"        -> (mediaDedup _),
    "media_features"      -> (mediaFeatures _),
    "media_resize_plan"   -> (mediaResizePlan _),
    "frame_sample_counts" -> (frameSampleCounts _))

  val oracle: Map[String, String] = Map(
    "media_dedup"        -> mediaDedupSql,
    "media_features"      -> mediaFeaturesSql,
    "media_resize_plan"   -> mediaResizePlanSql,
    "frame_sample_counts" -> frameSampleCountsSql)
}
