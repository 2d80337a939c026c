package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** STRUCTURAL enforcement of the capped trackers' composition contract
  * (r15, ADVICE): [[LshDedupTracker]] and [[SemanticDedupTracker]] emit
  * drop-marker sentinel rows (band/bucket = -1, negated counts) once
  * their bucket cap trips, and only `observeDrops` counts-and-strips
  * them — so a main-tree consumer that constructs a tracker directly
  * and skips the wrapper silently ships sentinels to its output. The
  * fused `ingest` builders are the one sanctioned composition path;
  * this spec makes that a suite failure instead of a documentation
  * convention: any `new LshDedupTracker(` / `new SemanticDedupTracker(`
  * outside the tracker's own file is flagged. Test sources are exempt
  * by construction (only `src/main` is scanned) — the equality and
  * recovery specs exercise the raw tracker deliberately. */
class CappedTrackerCompositionSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"spec must run from the repo root, no $root")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  private def offenders(ctor: String, definingFile: String): Seq[String] =
    mainSources
      .filterNot(_.getFileName.toString == definingFile)
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala
        lines.zipWithIndex.collect {
          // constructor calls only — scaladoc references to the class
          // name and the companion's own builder are not call sites
          case (l, i) if l.contains(s"new $ctor(") || l.contains(s"new graft.streaming.$ctor(") =>
            s"$p:${i + 1}: ${l.trim}"
        }
      }

  test("main tree composes LshDedupTracker only via ingest") {
    val hits = offenders("LshDedupTracker", "LshDedupTracker.scala")
    assert(hits.isEmpty,
      "raw LshDedupTracker construction outside the fused ingest builder — " +
        "a consumer skipping observeDrops receives drop-marker sentinel rows:\n" +
        hits.mkString("\n"))
  }

  test("main tree composes SemanticDedupTracker only via ingest") {
    val hits = offenders("SemanticDedupTracker", "SemanticDedupTracker.scala")
    assert(hits.isEmpty,
      "raw SemanticDedupTracker construction outside the fused ingest builder — " +
        "a consumer skipping observeDrops receives drop-marker sentinel rows:\n" +
        hits.mkString("\n"))
  }
}
