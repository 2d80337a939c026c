package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The two raw-ingest front doors a corpus pipeline starts from:
  * `binaryFile` (opaque media blobs → the Multimodal tier's (content,
  * metadata) shape) and `text`/`wholetext` (raw corpus files → document
  * rows). Both are driver-less Spark sources that scale by file split —
  * this spec proves the plumbing end-to-end on real temp files. */
class RawSourcesSpec extends AnyFunSuite with SparkSpec {

  test("binaryFile source feeds the multimodal feature pass byte-exactly") {
    val dir = Files.createTempDirectory("graft_bin").toFile
    try {
      val payloads = Map(
        "a.bin" -> Array[Byte](1, 2, 3, 4, 5),
        "b.bin" -> Array.tabulate(256)(i => i.toByte))
      payloads.foreach { case (name, bytes) =>
        Files.write(Paths.get(dir.getPath, name), bytes)
      }
      val media = spark.read.format("binaryFile").load(dir.getPath)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("media_id"),
          col("length"), col("content"))
      val rows = media.collect().map(r =>
        r.getAs[String]("media_id") ->
          (r.getAs[Long]("length"), r.getAs[Array[Byte]]("content"))).toMap
      assert(rows.keySet === payloads.keySet)
      payloads.foreach { case (name, bytes) =>
        assert(rows(name)._1 === bytes.length.toLong)
        assert(rows(name)._2.toSeq === bytes.toSeq, s"$name content must round-trip")
      }
      // the Multimodal codegen'd feature pass runs directly on this shape
      val feats = graft.operators.Multimodal.binaryFeatures(
        media.withColumn("kind", lit("blob"))
          .withColumn("meta", struct(lit(1).as("n_frames"))))
      val f = feats.collect().map(r =>
        r.getAs[String]("media_id") -> (r.getAs[Int]("n_bytes"), r.getAs[String]("sha256"))).toMap
      assert(f("a.bin")._1 === 5)
      assert(f("b.bin")._1 === 256)
      // sha over the streamed bytes equals sha over the original bytes
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(payloads("a.bin")).map("%02x".format(_)).mkString
      assert(f("a.bin")._2 === sha)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("text and wholetext sources turn raw files into document rows") {
    val dir = Files.createTempDirectory("graft_txt").toFile
    try {
      Files.writeString(Paths.get(dir.getPath, "d1.txt"), "alpha beta\ngamma\n")
      Files.writeString(Paths.get(dir.getPath, "d2.txt"), "delta\n")
      // line mode: one row per line (the JSONL/plain-corpus shape)
      val lines = spark.read.text(dir.getPath)
      assert(lines.count() === 3)
      assert(lines.columns.toSeq === Seq("value"))
      // wholetext: one row per FILE — the doc-per-file corpus shape,
      // straight into the text tier's tokenizer
      val docs = spark.read.option("wholetext", "true").text(dir.getPath)
        .select(graft.functions.TextFunctions.tokens(col("value")).as("toks"))
        .select(size(col("toks")).as("n_tokens"))
        .collect().map(_.getInt(0)).sorted.toSeq
      // NB: this once returned (2, 4) — Spark split() keeps trailing
      // empty strings, so the files' final "\n" grew a bogus token until
      // tokens() started trimming the full \s set
      assert(docs === Seq(1, 3), "token counts per file: d2=1, d1=3")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
