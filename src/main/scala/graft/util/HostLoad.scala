package graft.util

/** Host-load probes shared by the bench harness and the grid runner.
  *
  * Two complementary channels, because hypervisor interference reaches a
  * guest two ways and each is invisible to the other's probe:
  *
  *  - STEAL (/proc/stat field 8): ticks the hypervisor ran someone else
  *    while this guest was runnable. Visible to the kernel, so it shows
  *    in [[stealPct]] — but a host that caps this guest's CPU
  *    bandwidth/frequency instead of preempting it can inflate
  *    wall-clock with NEAR-ZERO steal (the r18 q177 anomaly class:
  *    570 s first sample, steal 3.9%, gc clean).
  *  - EFFECTIVE THROUGHPUT ([[mtSpinSecs]]): a fixed all-thread pure-CPU
  *    workload, timed. No allocation, no Spark, no I/O — its wall-clock
  *    moves ONLY with how much CPU the guest actually gets, so capping
  *    that steal cannot see shows up as spin/spinRef > 1. The
  *    multi-thread shape matters: the r9 lesson is that contention which
  *    barely moves a single-thread probe inflates 32-thread workloads
  *    4-6x, and grid fits are exactly the all-thread class.
  */
object HostLoad {

  /** Host CPU ticks from /proc/stat: (busy, idle+iowait, steal). */
  def cpuTicks(): Option[(Long, Long, Long)] =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal
      val busy = f(0) + f(1) + f(2) + f(5) + f(6)
      Some((busy, f(3) + f(4), if (f.length > 7) f(7) else 0L))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Steal percentage of total host ticks between two snapshots, -1 when
    * /proc/stat is unavailable (non-Linux). */
  def stealPct(a: Option[(Long, Long, Long)],
      b: Option[(Long, Long, Long)]): Double = (a, b) match {
    case (Some((b0, i0, s0)), Some((b1, i1, s1))) =>
      val tot = (b1 - b0) + (i1 - i0) + (s1 - s0)
      if (tot <= 0) 0.0 else (s1 - s0) * 100.0 / tot
    case _ => -1.0
  }

  // JIT-elimination sink for the spin loops (volatile write per thread,
  // once per probe — no measurable cost, keeps the loop alive)
  private val sink = new java.util.concurrent.atomic.AtomicLong()

  /** Wall seconds for `threads` concurrent fixed xorshift64 loops
    * (~60 M steps each, ≈70-90 ms nominal on an uncontended 2 GHz core).
    * Allocation-free after thread startup, so the ratio against a
    * same-JVM reference sample isolates CPU availability from GC/JIT
    * state. Call twice untimed before the first kept sample (C2 warm). */
  def mtSpinSecs(threads: Int): Double = {
    val iters = 60000000L
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        var n = 0L
        while (n < iters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1
        }
        sink.addAndGet(x)
        ()
      }, s"graft-spin-$i")
      t.setDaemon(true)
      t
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
