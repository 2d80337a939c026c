package graft

import org.apache.spark.sql.SparkSession

/** The measurement contention gate, shared by every recording main
  * (`Bench`, `ScaleSmoke`, `StreamBench`): the harness box suffers
  * co-located steal in ~10-minute waves that the load average reports
  * unreliably, and three rounds' bench recordings (r2/r5/r10) plus the
  * r11 scale rows (`knn_inc_recall` 14.2–17.7 s vs 10.9–12.5 s with
  * untouched code; the `state_lsh_neardup` 2400 s-horizon wall) were
  * contaminated because only `Bench` carried a gate. Every recorded
  * row now goes through [[awaitCalm]] and carries its probe stamp, so
  * a contaminated datapoint is self-identifying instead of needing
  * cross-round archaeology.
  *
  * The probe is a fixed CPU-bound reference job — a codegen'd 400M-row
  * range sum, no I/O, no shuffle, no data dependence — timed min-of-3
  * after two warm passes. On this box idle it reads ~[[ProbeIdleRef]] s;
  * under co-located load it stretches by the same factor the query
  * timings do, so a reader can normalize any row as
  * `wall × (ProbeIdleRef / probe_sec)` without consulting the baseline
  * archive. */
object ContentionGate {

  /** Idle-box reference (min-of-3 of the twice-warmed probe at 32
    * threads, measured on the harness machine near-idle; re-measure if
    * the hardware changes). */
  val ProbeIdleRef = 0.11

  /** Above this × [[ProbeIdleRef]] the box is treated as contended and
    * [[awaitCalm]] waits (r10's polluted start read 1.75×; a quiet box
    * reads ≤ ~1.2× even cold). */
  val ContendedFactor = 1.3

  /** Bounded wait: this many 30 s sleeps (+ re-probes) before recording
    * anyway with `contended=true` — a permanently busy box must still
    * produce an artifact, just a self-identifying one. */
  val MaxWaits = 8

  val WaitMs = 30000L

  /** One gated measurement window: last probe reading, waits spent, and
    * whether the window is still contended (record anyway, stamped). */
  case class Window(probeSec: Double, waits: Int, contended: Boolean) {
    /** The JSON fields every gated artifact row carries. */
    def jsonFields: String =
      s""""probe_sec":$probeSec,"probe_idle_ref":$ProbeIdleRef,"contended":$contended"""
  }

  def probe(spark: SparkSession, threads: Int = 32): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, threads)
        .selectExpr("sum(id * 3 + 1)").head()
      (System.nanoTime() - t0) / 1e9
    }
    once(); once() // codegen + JIT warm (one pass leaves ~60% overhead)
    math.round(Seq(once(), once(), once()).min * 1000) / 1000.0
  }

  /** REFUSE to start a measurement on a contended box: probe, and while
    * the reading is above [[ContendedFactor]] × idle, sleep 30 s and
    * re-probe, up to `maxWaits` times. ~0.5 s on a calm box. */
  def awaitCalm(spark: SparkSession, threads: Int = 32,
      maxWaits: Int = MaxWaits, label: String = ""): Window = {
    var p = probe(spark, threads)
    var waits = 0
    while (p > ContendedFactor * ProbeIdleRef && waits < maxWaits) {
      waits += 1
      println(f"""{"metric":"contention_wait","probe":"$label","attempt":$waits,"probe_sec":$p}""")
      Thread.sleep(WaitMs)
      p = probe(spark, threads)
    }
    Window(p, waits, p > ContendedFactor * ProbeIdleRef)
  }
}
