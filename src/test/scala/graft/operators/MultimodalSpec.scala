package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Multimodal._

/** Frame-level coverage of the stubbed decode path (bytes, not just
  * counts — the counts are oracle-verified in MultimodalQueries). */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("sampleFrames slices content and keeps every Nth frame") {
    import spark.implicits._
    val content = Array.tabulate[Byte](2500)(i => (i % 127).toByte)
    val media = Seq(
      MediaRow(7L, "video/fake", content, MediaMeta(64, 48, 0, 3))).toDS()

    val frames = sampleFrames(spark, media, everyN = 2).collect().sortBy(_.frame_idx)
    // 3 frames (1024, 1024, 452 bytes); every 2nd → idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames(0).frame_bytes.toSeq === content.slice(0, 1024).toSeq)
    assert(frames(1).frame_bytes.toSeq === content.slice(2048, 2500).toSeq)
    assert(frames.forall(_.media_id === 7L))
  }

  test("empty content yields no frames") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "x", Array.empty[Byte], MediaMeta(0, 0, 0, 0))).toDS()
    assert(sampleFrames(spark, media, everyN = 4).count() === 0)
  }

  // ---- real binary fixture ------------------------------------------------
  // syntheticMedia produces genuinely non-UTF-8 image-like blobs (PNG magic
  // + hash-chained bytes) — the payloads a real media column carries, which
  // the documents-derived pseudo-media cannot exercise.

  test("syntheticMedia blobs are deterministic, non-UTF-8, and PNG-magic'd") {
    import org.apache.spark.sql.functions._
    val m = syntheticMedia(spark, 64)
    val rows = m.select(col("media_id"), col("content")).collect()
    assert(rows.length === 64)
    val byId = rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // PNG magic on every blob; 0x89 leading byte is not valid UTF-8
    byId.values.foreach { bytes =>
      assert(bytes.take(8).map(_ & 0xff).toSeq ===
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      assert(bytes.length >= 8 + 256)
    }
    // regenerating yields byte-identical content (fixture is a pure
    // function of the id — safe to rebuild at any scale, no stored state)
    val again = syntheticMedia(spark, 64).select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    byId.foreach { case (id, bytes) =>
      assert(again(id).toSeq === bytes.toSeq, s"blob $id not deterministic")
    }
    // lengths vary across rows (the partition-sizing dimension)
    assert(byId.values.map(_.length).toSet.size > 8)
  }

  test("binary blobs survive a parquet round-trip bit-for-bit") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("media_fixture").toString
    val before = syntheticMedia(spark, 32)
    before.write.mode("overwrite").parquet(dir)
    val after = spark.read.parquet(dir)
    // content-addressing digest agrees pre/post round-trip, row by row
    val d0 = before.select(col("media_id"), sha2(col("content"), 256).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val d1 = after.select(col("media_id"), sha2(col("content"), 256).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d0 === d1)
    assert(after.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
  }

  test("decode pipeline runs end-to-end on real binary blobs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = syntheticMedia(spark, 48)
      .select(col("media_id"), col("kind"), col("content"),
        struct(lit(64).as("width"), lit(48).as("height"),
          lit(0).as("sample_rate"),
          ceil(octet_length(col("content")).cast("double") / FrameBytes)
            .cast("int").as("n_frames")).as("meta"))
    val sampled = sampleFrames(spark, media.as[MediaRow], everyN = 2)
    // every sampled frame's bytes re-slice out of the original blob
    val blobs = media.select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    sampled.collect().foreach { f =>
      val expect = blobs(f.media_id)
        .slice(f.frame_idx * FrameBytes, (f.frame_idx + 1) * FrameBytes)
      assert(f.frame_bytes.toSeq === expect.toSeq)
      assert(f.frame_idx % 2 === 0)
    }
  }

  test("the imperative decode fan-out emits exactly the declarative frame manifest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.fromDocuments(
      graft.sources.Tables.documents(spark, dir))
    val sampled = sampleFrames(spark, media.as[MediaRow], everyN = 4)
      .collect()
      .map(f => (f.media_id, f.frame_idx, f.frame_bytes.length))
      .sorted
    val manifest = graft.queries.MultimodalQueries.frameManifest(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sorted
    assert(sampled.toSeq === manifest.toSeq,
      "mapPartitions fan-out and the oracled manifest disagree")
  }

  test("a headerless payload starting with the magic degrades to NULL fields, not a cast error") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // media_id 0 is in the corrupt (headerless) bucket; its payload
    // BEGINS with the magic but carries junk where the width digits
    // belong — the collision that would hard-error an ANSI cast
    val df = Seq((0L, "EXIFnotdigits-and-then-some"))
      .toDF("media_id", "content_h")
      .select(col("media_id"), col("content_h").cast("binary").as("content_h"))
    val r = exifMeta(df).collect().head
    assert(r.getBoolean(1), "prefix collision: magic check is expected to pass")
    assert(r.isNullAt(2) && r.isNullAt(3), "junk fields must parse to NULL")
    // payload_bytes still subtracts the header length deterministically
    assert(r.getInt(5) === "EXIFnotdigits-and-then-some".length - ExifHeaderLen)
  }

  test("EXIF header round-trips over non-UTF-8 payloads") {
    import org.apache.spark.sql.functions._
    val media = syntheticMedia(spark, 200)
      .select(col("media_id"), col("kind"), col("content"),
        struct(
          (lit(100) + col("media_id").cast("int")).as("width"),
          lit(75).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"))
    val parsed = exifMeta(withExifHeader(media)).collect()
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % ExifCorruptEvery == 0)
        // headerless bucket: binary payload starts 0x89…, never "EXIF"
        assert(!r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      else {
        assert(r.getBoolean(1))
        assert(r.getInt(2) === 100 + id.toInt)
        assert(r.getInt(3) === 75)
        assert(r.getInt(4) === (id % 8 + 1).toInt)
      }
    }
  }
}
