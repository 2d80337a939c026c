package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The module-wide numeric conventions shared by every query module and
  * mirrored in the DuckDB oracles — defined once so a convention change
  * cannot drift between modules. */
private[queries] object QueryConventions {

  /** Exact, order-independent SUM of fractional doubles: go through
    * DECIMAL(18,6) so partial-aggregation order cannot perturb the result
    * (a raw double sum differs run-to-run across partitionings), then to
    * double rounded to cents. Oracle side:
    * `round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 2)`. */
  def decSum(c: Column): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double"), 2)

  /** Registry-wide materialization point for build frames consumed more
    * than once (self-joins, multi-aggregate fan-outs): localCheckpoint,
    * NOT cache() — blocks reclaimed by the ContextCleaner when the
    * result frame is garbage-collected, no catalog pinning (the
    * RegistryAuditSpec hygiene test).
    *
    * EAGER (not lazy) deliberately: a lazy checkpoint materializes
    * inside whatever job touches the frame FIRST — which can be a
    * broadcast-exchange thread running concurrently with the main AQE
    * job — and Spark's checkpoint commit has a lock-order inversion
    * against the DAG scheduler (markCheckpointed takes
    * RDDCheckpointData$ → the RDD monitor, while the scheduler's
    * getCacheLocs/checkpointRDD visit takes the RDD monitor →
    * RDDCheckpointData$). A full-suite run deadlocked exactly there
    * (r8: dag-scheduler-event-loop vs broadcast-exchange-176, jstack-
    * confirmed). Materializing eagerly on the CONSTRUCTION thread means
    * no other job references the RDD while its checkpoint commits, so
    * the inversion window never opens.
    *
    * The `graft.materialize=off` system property is the PLAN-AUDIT escape
    * hatch: a checkpoint boundary prints as an opaque `Scan ExistingRDD`,
    * which would blind plan-string audits (no-UDF, no-cartesian, pushed
    * bounds) to everything upstream of the boundary. Audits set the
    * property to build the un-truncated plan; execution paths (Verify,
    * Bench, the driver) leave it unset and get the materializing form. */
  private[queries] implicit class MaterializeSyntax(
      private val df: org.apache.spark.sql.DataFrame) {
    def materializeOnce: org.apache.spark.sql.DataFrame =
      if (MaterializeMode.isOff) {
        MaterializeCounter.bump()
        // record the subtree's OWN physical scan signatures (r13): the
        // executed form performs exactly these scans once — when the
        // checkpoint materializes — while the audit-form full plan
        // repeats them per downstream consumer. The digest uses the
        // recorded set to tag lineage-view repetitions as
        // kind=materialized, so a pushdown audit stops re-adjudicating
        // checkpoint re-reads by hand (the PLANS artifact's scans field).
        MaterializeCounter.recordScans(
          graft.plans.PlanDigest.scanSignatures(df))
        df
      } else df.localCheckpoint(true)
  }
}

/** Thread-local override of the `graft.materialize` audit switch (r12):
  * the merged registry audit walk builds DIGESTS under the global
  * audit-off property but runs its pin/execution leg in the REAL
  * materializing form — executing the audit form re-evaluates every
  * `materializeOnce` build frame per consumer and measured minutes, not
  * seconds, over the registry. The override is per-thread so one pool
  * task can flip forms without touching the property every other task
  * is reading. None = follow the system property. */
object MaterializeMode {

  /** SINGLE-THREAD-BUILD INVARIANT (r13, ADVICE): both this override
    * and [[MaterializeCounter]] are per-thread, so a query builder must
    * construct ALL its frames on the calling thread. A builder that
    * moved frame construction onto a helper thread inside a
    * `withReal` walk would silently build the audit (non-checkpointed)
    * form there — the helper thread reads the global
    * `graft.materialize=off` property, not this thread's override — and
    * its materialize points would vanish from the digest. Every
    * registered builder today is straight-line driver code on one
    * thread; a future builder that spawns threads must thread the mode
    * through explicitly or it fails the digest-currency and
    * materialize-point checks in `RegistryAuditSpec` (the counter reads
    * zero on the walk thread). */
  private val tl = new ThreadLocal[Option[Boolean]] {
    override def initialValue(): Option[Boolean] = None
  }
  private[queries] def isOff: Boolean =
    tl.get().getOrElse(sys.props.get("graft.materialize").contains("off"))
  /** Runs `body` with materialization FORCED ON for this thread,
    * regardless of the global audit property. */
  def withReal[A](body: => A): A = {
    val prev = tl.get()
    tl.set(Some(false))
    try body finally tl.set(prev)
  }
}

/** Per-thread count of `materializeOnce` calls made while plans are built
  * in audit mode (`graft.materialize=off`) — the `materialize_points`
  * field of the PLANS artifact. The audit-form digest shows the FULL
  * un-truncated lineage (a checkpoint boundary would blind the
  * no-UDF/no-cartesian walks), so its scan counts are lineage-view, not
  * runtime I/O: `snm_multipass_dups` digests 42 documents.parquet scan
  * nodes the executed (checkpointed) form never performs. This counter
  * tells an artifact consumer how many checkpoint boundaries the EXECUTED
  * form inserts, so audit lineage and runtime reads are distinguishable
  * without a second (execution-priced) digest pass. Thread-local because
  * the plan walks build queries on a pool — each build runs wholly on one
  * thread; reset before, read after. */
object MaterializeCounter {
  private val n = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = Array(0)
  }
  // the scan signatures ((table, pushed, cols)) of every materialized
  // subtree's standalone physical plan, accumulated per thread alongside
  // the count — the PLANS artifact's base|materialized scan tags (r13)
  private val sigs = new ThreadLocal[scala.collection.mutable.Set[(String, Int, Int)]] {
    override def initialValue() = scala.collection.mutable.Set.empty
  }
  private[queries] def bump(): Unit = n.get()(0) += 1
  private[queries] def recordScans(s: Iterable[(String, Int, Int)]): Unit =
    sigs.get() ++= s
  def reset(): Unit = { n.get()(0) = 0; sigs.get().clear() }
  def value: Int = n.get()(0)
  def scanSignatures: Set[(String, Int, Int)] = sigs.get().toSet
}
