package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data-pipeline tier:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything is built from `org.apache.spark.sql.functions` (codegen'd,
  * runs inside WholeStageCodegen — no UDFs), with higher-order array
  * functions for per-token work so nothing leaves the executor row loop.
  * Regexes use only constructs with identical semantics in Java regex
  * (Spark) and RE2 (DuckDB oracle): simple classes, `+`, alternation.
  */
object TextFunctions {

  /** Small embedded stopword lists for the language-ID heuristic. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  val esStopwords: Seq[String] =
    Seq("el", "la", "de", "los", "las", "un", "una", "y", "en", "que")

  /** Lowercase, strip non-alphanumerics, collapse whitespace — the
    * canonical form used for fingerprinting and exact dedup. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** The Java-regex \s character set, trimmed from both ends before
    * tokenization: Spark's one-arg trim() strips SPACES only while
    * split() KEEPS trailing empty strings, so "\n"-terminated text (i.e.
    * every real file) would otherwise grow a bogus empty token — caught
    * by RawSourcesSpec; the oracle CTEs trim the same chr set. */
  private val Ws = " \t\n\r\u000B\f"

  /** Whitespace tokens; empty/blank text → empty array (split would give
    * a single empty-string token). */
  def tokens(c: Column): Column =
    when(length(trim(c, Ws)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c, Ws), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * punctuation marks each count as one token. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Occurrences (not distinct) of `words` among the tokens. */
  def stopwordCount(toks: Column, words: Seq[String]): Column = {
    val lst = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lst, t)))
  }

  /** Fraction of [a-z] characters after lowercasing; 0.0 for empty. */
  def alphaRatio(c: Column): Column =
    when(length(c) > 0,
      length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") / length(c))
      .otherwise(lit(0.0))

  /** Content-quality heuristic in [0,1]: token volume, alphabetic purity,
    * stopword density (natural text has stopwords; keyword spam doesn't). */
  def qualityScore(nTokens: Column, alphaR: Column, stopR: Column): Column =
    lit(0.3) * least(lit(1.0), nTokens.cast("double") / 50.0) +
      lit(0.3) * alphaR +
      lit(0.4) * least(lit(1.0), stopR * 5.0)

  /** Exact-dedup document fingerprint: md5 of the canonical text. */
  def fingerprint(c: Column): Column = md5(normText(c))
}
