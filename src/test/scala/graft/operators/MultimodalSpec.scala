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
}
