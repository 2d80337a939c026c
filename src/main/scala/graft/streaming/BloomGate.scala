package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Streaming face of the Bloom ingest gate — the constant-memory fast
  * path `DedupQueries.bloomIncrementalDedup` exercises in batch, wired
  * for a micro-batch ingest stream:
  *
  *   - [[buildBits]] summarizes the base fingerprint index ONCE into the
  *     packed m-bit bitmap (the driver folds ≤ m distinct positions —
  *     m/8 bytes total, which is the whole point of the summary; the
  *     scan producing those positions is distributed).
  *   - [[probe]] is a PURE MAP-SIDE membership test inside the stream:
  *     no join, no shuffle, no state. All k positions set ⇒ POSSIBLE
  *     duplicate (route to exact verification); any clear ⇒ DEFINITELY
  *     new (bypass the index entirely). The gate itself keeps zero
  *     per-key state, so in a gated ingest the only stateful operator is
  *     the downstream exact dedup (`dropDuplicatesWithinWatermark`),
  *     whose state is bounded by the gate's pass-throughs instead of the
  *     full batch.
  *
  * The (m, k, position-hash) definition is shared with the batch entry
  * via [[graft.operators.DedupOps.bloomPositions]], so the streaming
  * decision is bit-identical to the oracled batch decision
  * (`BloomGateStreamSpec` pins it across scrambled micro-batches).
  *
  * Scale note: the bitmap rides the plan as ONE array literal — right
  * for summaries up to ~MBs. A 100 TB-class index wants m in the GBs;
  * there the same probe runs against a broadcast variable through a
  * native expression (or the bitmap shards into a broadcast-joined
  * (word_index, word) table); the decision function is unchanged. */
object BloomGate {

  /** Packed m-bit bitmap of the base fingerprints (little-endian bit
    * order within each 64-bit word). Input: a frame with a
    * `fingerprint` column; the position explode + distinct runs
    * distributed and collapses to ≤ m rows before the driver collect. */
  def buildBits(baseFingerprints: DataFrame): Array[Long] = {
    val words = new Array[Long]((DedupOps.BloomM / 64).toInt)
    baseFingerprints
      .select(explode(DedupOps.bloomPositions(col("fingerprint"))).as("pos"))
      .distinct() // ≤ m rows regardless of base size
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p / 64).toInt) |= 1L << (p % 64).toInt
      }
    words
  }

  /** Map-side membership probe: TRUE ⇔ all k positions set — the
    * identical decision to the batch entry's broadcast-join form. */
  def probe(bits: Array[Long], fp: Column): Column = {
    // unpack once to a 0/1 map so the per-row test is a plain array
    // index — lit() embeds it as a single array literal, not m literals
    val flat = Array.tabulate(DedupOps.BloomM.toInt) { i =>
      ((bits(i / 64) >>> (i % 64)) & 1L).toInt
    }
    val bitmap = lit(flat)
    forall(DedupOps.bloomPositions(fp),
      p => element_at(bitmap, p.cast("int") + 1) === 1)
  }
}
