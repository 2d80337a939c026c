package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection operators for the training-data-pipeline tier:
  * word-shingling, MinHash signatures + LSH banding, SimHash.
  *
  * Hashing is md5-derived (first 15 hex chars → 60-bit int) so the exact
  * same integer stream is computable in the DuckDB oracle
  * (`CAST('0x'||substring(md5(s),1,15) AS BIGINT)`) — every stage of the
  * pipeline stays hash-verifiable, not just the final pair list.
  *
  * Scale shape: shingling/hashing are map-only; MinHash aggregation
  * shuffles (doc, seed) partials; LSH banding shuffles one small row per
  * (doc, band); the candidate join is an equi-join on (band, band_key) —
  * the O(N²) all-pairs comparison never materializes. That is the plan
  * that survives 100 TB; the all-pairs forms exist only as test-scale
  * recall baselines.
  */
object DedupOps {

  /** Mersenne prime 2^31−1: universal-hash modulus. */
  val P: Long = 2147483647L

  val NumHashes = 12
  val BandRows = 3 // 4 bands × 3 rows

  /** Seeded (a, b) pairs for the universal hash family
    * h_k(x) = (a_k·x + b_k) mod P — identical literals on both engines. */
  val seeds: Seq[(Int, Long, Long)] = {
    val rnd = new java.util.Random(7)
    (0 until NumHashes).map { k =>
      (k, (rnd.nextInt((P - 1).toInt) + 1).toLong, rnd.nextInt(P.toInt).toLong)
    }
  }

  /** 60-bit base hash of a string, shared with the oracle. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h31(c: Column): Column = h60(c) % P

  /** Distinct word 3-gram shingles; docs with 1–2 tokens fall back to a
    * single whole-text shingle, empty docs to an empty set. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(
      when(size(toks) >= n, grams)
        .when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
  }

  /** (doc_id, shingles) for every document. */
  def docShingles(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      shingles(TextFunctions.tokens(col("text"))).as("shingles"))

  /** MinHash signatures, flat: (doc_id, k, minhash). One shuffle on
    * (doc_id, k) with map-side partial min. */
  def minhashSignatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val seedDf = seeds.toDF("k", "a", "b")
    docShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .withColumn("h31", h31(col("s")))
      .crossJoin(broadcast(seedDf))
      .groupBy(col("doc_id"), col("k"))
      .agg(min((col("a") * col("h31") + col("b")) % P).as("minhash"))
  }

  /** LSH bands: (doc_id, band, band_key) where band_key fingerprints the
    * band's minhash run in k-order. */
  def lshBands(spark: SparkSession, docs: DataFrame): DataFrame =
    minhashSignatures(spark, docs)
      .groupBy(col("doc_id"), expr(s"k div $BandRows").as("band"))
      .agg(md5(concat_ws("_",
        transform(
          array_sort(collect_list(struct(col("k"), col("minhash")))),
          x => x.getField("minhash").cast("string")))).as("band_key"))

  /** Candidate pairs: same (band, band_key) in any band, deduplicated. */
  def lshCandidates(spark: SparkSession, docs: DataFrame): DataFrame = {
    val b = lshBands(spark, docs)
    val l = b.select(col("doc_id").as("a_id"), col("band"), col("band_key"))
    val r = b.select(col("doc_id").as("b_id"), col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact Jaccard over distinct shingle sets (sizes only — order-free). */
  def jaccard(sa: Column, sb: Column): Column = {
    val i = size(array_intersect(sa, sb)).cast("double")
    i / (size(sa) + size(sb) - i)
  }

  /** SimHash (48-bit): per-token 60-bit hashes vote ±1 on each of 48 bit
    * positions; the sign vector packs into a BIGINT. */
  def simhash48(spark: SparkSession, docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("t"))
      .withColumn("h60", h60(col("t")))
      .select(col("doc_id"), col("h60"), explode(sequence(lit(0), lit(47))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(
        when(expr("(h60 div cast(pow(2, j) as bigint)) % 2") === 1, 1)
          .otherwise(-1)).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(
        when(col("s") >= 0, expr("cast(pow(2, j) as bigint)")).otherwise(0L))
        .cast("long").as("simhash"))
}
