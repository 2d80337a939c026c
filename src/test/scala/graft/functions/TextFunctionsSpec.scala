package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextFunctions._

/** Edge coverage the corpus doesn't exercise: empty/blank/whitespace-only
  * text through every text builder (the guards exist on both engines; the
  * corpus has no blank docs, so only this spec executes the branch). */
class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("blank and degenerate text through the text builders") {
    import spark.implicits._
    val df = Seq(
      ("", 1), ("   ", 2), ("word", 3), ("the the the", 4),
      ("a!b@c#123", 5)).toDF("text", "id")
    val out = df.select(
      col("id"),
      tokenCount(col("text")).as("n_tok"),
      bpeTokenCount(col("text")).as("n_bpe"),
      alphaRatio(col("text")).as("alpha"),
      normText(col("text")).as("norm"),
      fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getInt(0) -> r).toMap

    assert(out(1).getAs[Int]("n_tok") === 0) // empty → no tokens
    assert(out(2).getAs[Int]("n_tok") === 0) // whitespace-only → no tokens
    assert(out(3).getAs[Int]("n_tok") === 1)
    assert(out(4).getAs[Int]("n_tok") === 3)
    assert(out(5).getAs[Int]("n_bpe") === 7) // a ! b @ c # 123
    assert(out(1).getAs[Double]("alpha") === 0.0)
    assert(out(5).getAs[String]("norm") === "a b c 123")
    // blank and whitespace-only normalize to the same fingerprint
    assert(out(1).getAs[String]("fp") === out(2).getAs[String]("fp"))
  }

  test("shingles of degenerate token counts") {
    import spark.implicits._
    val df = Seq("", "one", "one two", "one two three four").toDF("text")
    val sizes = df.select(
      graft.operators.DedupOps.shingles(tokens(col("text"))).as("sh"))
      .select(size(col("sh"))).collect().map(_.getInt(0)).toSeq
    assert(sizes === Seq(0, 1, 1, 2)) // empty / whole-doc / whole-doc / 2 trigrams
  }
}
