package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Dev-only scale probe: replicate the documents corpus K× (doc_id
  * offsets, small text perturbation via an id suffix so dedup isn't
  * trivially degenerate) and measure the MinHash/LSH pipeline's scaling
  * behavior — the empirical check behind the "survives a scale-up" claims
  * in COVERAGE.md.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n0 = docs.count()
    // replica id offset derived from the actual max id — a fixed offset
    // would alias ids (and silently shrink the probe) on larger corpora
    val docOff = Option(docs.agg(max(col("doc_id"))).head().get(0))
      .fold(sys.error(s"empty documents table in $sfDir"))(_.asInstanceOf[Number].longValue) + 1
    val scaled = (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * docOff)).as("doc_id"),
        // perturb each replica so replicas are near-dups, not exact dups
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionAll _).repartition(32).cache()
    val n = scaled.count()
    println(s"[scale] corpus ${n0} -> $n docs (${k}x)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    val sh = DedupOps.docShingles(scaled).cache()
    time("shingles")(sh.count())
    time("minhash_wide")(DedupOps.minhashWide(spark, sh).count())
    time("lsh_bands")(DedupOps.bandsFromShingles(spark, sh).count())
    time("lsh_candidates")(DedupOps.candidatesFromShingles(spark, sh).count())
    time("simhash")(DedupOps.simhash48(spark, scaled).count())
    // banded pair step: candidate count should track dup-clique size (each
    // base doc's K replicas), NOT corpus² — the pigeonhole-banding claim
    time("simhash_banded_cand")(
      graft.queries.DedupQueries.simhashBandedCandidates(spark, scaled).count())
    // the hot-bucket skew guard: replica-saturated chunks make the exact
    // candidate set grow as bucket² (324M pairs / 221 s at 50×); capping
    // buckets at 4× the replica count keeps genuine near-dup buckets while
    // bounding the join
    time("simhash_banded_capped")(
      graft.queries.DedupQueries.simhashBandedCandidates(spark, scaled,
        maxBucket = Some(4 * k)).count())
    time("winnow_fps")(DedupOps.winnowFingerprints(scaled).count())
    // ingestion-order novelty, aggregate-only shape (mirrors the registered
    // query): per-doc denominators + first-occurrence counts, joined as two
    // doc-sized frames — the only shingle-sized shuffle is groupBy(shingle)
    time("ngram_novelty") {
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      val perDoc = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      val novel = ex.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc")).agg(count(lit(1)).as("n_novel"))
        .select(col("first_doc").as("doc_id"), col("n_novel"))
      perDoc.join(novel, Seq("doc_id"), "left").count()
    }

    // PMI collocation mining (mirrors token_pmi_top minus the fixed top-20
    // tail): unigram + shifted-slice pair counts are ∝ tokens (map-side
    // explodes, one groupBy each); the scored join is on the pair-vocab
    // frame, which saturates at vocab² regardless of corpus size — wall
    // should track K, not K²
    time("token_pmi") {
      val docs = scaled
        .select(graft.functions.TextFunctions.tokens(col("text")).as("toks")).cache()
      val uni = docs.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c")).cache()
      def sp(d: Int) = docs.select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - d, lit(0))),
        slice(col("toks"), lit(1 + d), greatest(size(col("toks")) - d, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
        .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      val pairs = sp(1).unionAll(sp(2))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      val n = pairs
        .join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
        .filter(col("c_xy") >= 5 && col("c_x") >= 10 && col("c_y") >= 10)
        .count()
      docs.unpersist(); uni.unpersist(); n
    }

    // sorted-neighborhood candidate generation (mirrors sorted_neighbor_dups
    // pre-verify): candidates are exactly N·(w−1) by construction; the
    // scale-sensitive step is the GLOBAL row_number (single-partition sort
    // here — this probe measures when the two-phase range-partitioned
    // numbering the scaladoc prescribes becomes mandatory)
    time("snm_candidates") {
      val rn = scaled.select(col("doc_id"),
        substring(graft.functions.TextFunctions.normText(col("text")), 1, 40).as("k"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("doc_id"))))
        .select("doc_id", "rn").cache()
      val n = rn.withColumn("d", explode(array((1 until 5).map(lit(_)): _*)))
        .select(col("doc_id").as("a"), (col("rn") + col("d")).as("rn_b"))
        .join(rn.select(col("doc_id").as("b"), col("rn").as("rn_b")), Seq("rn_b"))
        .count()
      rn.unpersist(); n
    }

    // prefix-filtered exact similarity join, hot-bucket capped: the replica
    // corpus saturates shingle buckets (every 3-gram's df multiplies by K,
    // candidates grow as bucket² — the uncapped join OOMs here exactly like
    // uncapped SimHash banding), so the probe runs the production guard.
    // Cap 2K keeps every clique's base-df-1 shingles (their replicated df
    // is exactly K) while dropping the boilerplate head whose buckets grow
    // as (K · base-df)². Replica cliques still qualify (J ≈ 0.85 ≥ τ):
    // verified pairs track cliques × K²/2, never corpus²
    time("jaccard_prefix_capped")(
      graft.queries.DedupQueries.jaccardPrefixJoinFrom(spark, scaled,
        maxBucket = Some(2 * k)).count())

    // duplicate-cluster extraction over the verified LSH pairs: rounds ∝
    // component diameter (replica cliques are near-cliques → 2-3), wall ∝
    // the DUP subset, never the corpus. If rounds ever grow with K here,
    // the min-label loop should switch to alternating large-star/small-star
    // (halves convergence rounds on chain-shaped components).
    time("dedup_components") {
      val pairs = graft.queries.DedupQueries.minhashLshDupsFrom(spark, scaled)
        .select(col("a_id"), col("b_id"))
      val (comp, rounds) =
        DedupOps.connectedComponentsWithRounds(spark, pairs)
      val n = comp.count()
      println(s"[scale] dedup_components converged in $rounds rounds")
      n
    }

    // relational tier: K× the order baskets through the co-purchase pair
    // generation (the dominant stage of part_pair_lift/part_triangles).
    // Replicated orders multiply each pair's support by K (so the
    // support>=2 edge SET saturates — the claim under test is the pair
    // JOIN's ~linear time in Σ basket², not the edge count)
    val li0 = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val okOff = Option(li0.agg(max(col("l_orderkey"))).head().get(0))
      .fold(sys.error(s"empty lineitem table in $sfDir"))(_.asInstanceOf[Number].longValue) + 1
    val liScaled = (0 until k).map { i =>
      li0.select((col("l_orderkey") + lit(i.toLong * okOff)).as("ok"),
        col("l_partkey").as("pk"))
    }.reduce(_ unionAll _).repartition(32).cache()
    println(s"[scale] baskets ${li0.count()} -> ${liScaled.count()} rows (${k}x)")
    time("copurchase_pairs") {
      val a = liScaled.select(col("ok"), col("pk").as("src"))
      val b = liScaled.select(col("ok"), col("pk").as("dst"))
      a.join(b, "ok").filter(col("src") < col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).count()
    }

    // vector tier: K× the embeddings corpus through the IVF refine step
    // (broadcast-centroid assignment is map-side — should scale ~linearly)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val vecOff = Option(emb.agg(max(col("vec_id"))).head().get(0))
      .fold(sys.error(s"empty embeddings table in $sfDir"))(_.asInstanceOf[Number].longValue) + 1
    val scaledEmb = (0 until k).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * vecOff)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionAll _).repartition(32).cache()
    println(s"[scale] embeddings ${emb.count()} -> ${scaledEmb.count()} (${k}x)")
    time("ivf_kmeans_refine")(
      graft.queries.SimilarityQueries.ivfKmeansRefineFrom(spark, scaledEmb).count())
    // semantic dedup: pair volume must track Σ cluster², not corpus² —
    // replicas are exact dups, so drops should scale ~linearly with K
    time("semantic_dedup")(
      graft.queries.SimilarityQueries.semanticDedupFrom(spark, scaledEmb).count())
    // IVF-PQ index build (residual quantization + codes): broadcast
    // map-side stages + dim×K partial-agg shuffles — ~linear in corpus
    time("ivfpq_codes")(
      graft.queries.SimilarityQueries.ivfPqParts(spark, scaledEmb)._3.count())

    // multimodal tier: real binary blobs (non-UTF-8, varied lengths) at
    // K× the base media count. decode_fanout is the mapPartitions frame
    // sampler — row fan-out ∝ total bytes, no shuffle; caption_pairs is
    // the media⋈embeddings id equi-join — one shuffle each side, ~linear
    val nMedia = n0 * k
    val media = graft.operators.Multimodal.syntheticMedia(spark, nMedia)
      .select(col("media_id"), col("kind"), col("content"),
        struct(lit(64).as("width"), lit(48).as("height"),
          lit(0).as("sample_rate"),
          ceil(octet_length(col("content")).cast("double")
            / graft.operators.Multimodal.FrameBytes).cast("int").as("n_frames"))
          .as("meta"))
      .repartition(32).cache()
    println(s"[scale] media $nMedia blobs (${k}x base corpus count)")
    time("media_sha_dedup")(
      media.groupBy(sha2(col("content"), 256)).agg(count(lit(1))).count())
    time("decode_fanout")(
      graft.operators.Multimodal.sampleFrames(
        spark, media.as[graft.operators.Multimodal.MediaRow], everyN = 4).count())
    time("caption_pairs")(
      media.join(scaledEmb, media("media_id") === scaledEmb("vec_id"))
        .select(col("media_id"), octet_length(col("content")),
          expr("aggregate(embedding, 0L, (acc, x) -> " +
            "acc + cast(round(cast(x as double) * 1000000) as bigint))"))
        .count())
    spark.stop()
  }
}
