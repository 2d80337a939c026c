package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata; decode/feature work happens in batched
  * per-partition functions.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[FakeCodec]] is a deterministic byte-slicer standing in for a
  * real decoder. Everything around it — the schema contract, the
  * `mapPartitions` batch shape (the Scala analog of arrow-batched pandas
  * UDFs), partition sizing, and the frame-sampling row logic — is real and
  * tested; swapping in a real codec changes only FakeCodec's body.
  *
  * Scale: media rows are large; the media table should be written with a
  * small `spark.sql.files.maxPartitionBytes` so a partition's worth of
  * content fits executor memory, and `decodeFrames` streams the iterator
  * (no per-partition materialization).
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_frames: Int)
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame size of the stubbed codec (bytes per fake "frame"). */
  val FrameBytes = 1024

  /** STUB decoder: deterministically slices the payload into fixed-size
    * frames. A real implementation would decode via an image/audio
    * library here — same signature, same batching. */
  object FakeCodec {
    def frames(content: Array[Byte]): Iterator[Array[Byte]] =
      content.grouped(FrameBytes)
  }

  /** Build a media table from `documents` — text payload as the opaque
    * binary column plus plausible typed metadata (deterministic fake
    * geometry keyed by media_id, standing in for decoded image
    * dimensions). Gives the multimodal path a harness-testdata-backed
    * input. The doc_id % 5 == 4 bucket gets 200×150 geometry — smaller
    * than resizePlan's default 256 box — so the no-upscale clamp
    * (scaled = false) branch is exercised under the oracle, not just the
    * downscale branch. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        when(pmod(col("doc_id"), lit(5)) === 4, lit(200))
          .otherwise(lit(320) + pmod(col("doc_id"), lit(5)) * 160)
          .cast("int").as("width"),
        when(pmod(col("doc_id"), lit(5)) === 4, lit(150))
          .otherwise(lit(240) + pmod(col("doc_id"), lit(3)) * 120)
          .cast("int").as("height"),
        lit(0).as("sample_rate"),
        ceil(octet_length(col("text").cast("binary")).cast("double") / FrameBytes)
          .cast("int").as("n_frames")).as("meta"))

  /** Resize planning — the metadata half of a distributed image resize:
    * fit (w, h) into a `box`×`box` bounding box preserving aspect ratio,
    * never upscaling. Pure projection (codegen); the pixel work would be
    * the stubbed codec's job, batched exactly like [[sampleFrames]]. */
  def resizePlan(media: DataFrame, box: Int = 256): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(box.toDouble) / w, lit(box.toDouble) / h, lit(1.0))
    media.select(
      col("media_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"),
      (scale < 1.0).as("scaled"))
  }

  /** Codegen'd binary feature extraction — no decode needed, stays in
    * WholeStageCodegen. */
  def binaryFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      octet_length(col("content")).as("n_bytes"),
      sha2(col("content"), 256).as("sha256"),
      hex(expr(s"substring(content, 1, 8)")).as("head_hex"),
      col("meta.n_frames").as("n_frames"))

  /** Decode + frame-sample via mapPartitions: batched, streaming over the
    * partition iterator. `everyN` keeps one frame in N (frame_idx % N == 0).
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        FakeCodec.frames(m.content).zipWithIndex.collect {
          case (bytes, idx) if idx % everyN == 0 => Frame(m.media_id, idx, bytes)
        }
      }
    }
  }

  // ---- EXIF-style typed metadata ------------------------------------------
  // A fixed-width ASCII header standing in for an EXIF/IFD block:
  //   bytes 1-4   magic  "EXIF"
  //   bytes 5-9   width  (zero-padded)
  //   bytes 10-14 height (zero-padded)
  //   byte  15    orientation (1-8)
  // Real EXIF is TIFF-encoded; fixed-width ASCII keeps the byte-offset
  // extraction cross-engine exact while exercising the same access
  // pattern: parse typed fields from a binary column at known offsets,
  // validity-gated on the magic, without decoding the payload.
  val ExifMagic = "EXIF"
  val ExifHeaderLen = 15
  /** 1-in-N media rows get NO header — the corrupt-input path that makes
    * the magic check a real validity predicate, not a tautology. */
  val ExifCorruptEvery = 97

  /** Writer half: prepend the header (skipping the corrupt bucket).
    * Pure codegen projection over the binary column. */
  def withExifHeader(media: DataFrame): DataFrame = {
    val hdr = concat(
      lit(ExifMagic),
      lpad(col("meta.width").cast("string"), 5, "0"),
      lpad(col("meta.height").cast("string"), 5, "0"),
      (pmod(col("media_id"), lit(8)) + 1).cast("string"))
    media.withColumn("content_h",
      when(pmod(col("media_id"), lit(ExifCorruptEvery)) === 0, col("content"))
        .otherwise(concat(hdr.cast("binary"), col("content"))))
  }

  /** Reader half: typed-metadata extraction from the binary at fixed byte
    * offsets. Fields are gated on the magic AND parsed with try_cast: a
    * headerless blob yields NULLs, and even the pathological collision —
    * a headerless payload that happens to START with the magic bytes —
    * degrades to NULL fields instead of an ANSI cast error. */
  def exifMeta(media: DataFrame): DataFrame = {
    val s = col("content_h")
    val ok = substring(s, 1, 4).cast("string") === lit(ExifMagic)
    def field(pos: Int, len: Int) =
      when(ok, expr(s"try_cast(cast(substring(content_h, $pos, $len) as string) as int)"))
    media.select(
      col("media_id"),
      ok.as("magic_ok"),
      field(5, 5).as("width"),
      field(10, 5).as("height"),
      field(15, 1).as("orientation"),
      (octet_length(s) -
        when(ok, lit(ExifHeaderLen)).otherwise(lit(0))).as("payload_bytes"))
  }

  /** Deterministic image-like binary fixture: a PNG magic followed by
    * hash-chained bytes (sha-512 segments over (media_id, segment)), with
    * per-row length varied by id. Genuinely non-UTF-8 content — the bytes
    * a real image column carries — generated entirely in codegen (no UDF,
    * no driver loop), so specs and scale probes can build it at any n. */
  def syntheticMedia(spark: SparkSession, n: Long, segments: Int = 16): DataFrame = {
    val pngMagic = "89504E470D0A1A0A"
    val body = concat((0 until segments).map(s =>
      unhex(sha2(concat_ws(":", lit("blob"), col("id"), lit(s)), 512))): _*)
    spark.range(n).select(
      col("id").as("media_id"),
      lit("image/png").as("kind"),
      // 8-byte magic + up to segments×64 chained bytes, length varied by id
      concat(unhex(lit(pngMagic)), body)
        .substr(lit(1),
          (lit(8 + 256) + pmod(col("id") * 131, lit(segments * 64L - 256))).cast("int"))
        .as("content"))
  }
}
