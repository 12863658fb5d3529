package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's contention-sentinel VERDICT ([[Bench.tierVerdict]])
  * — the r19 closure of "label an inflated run in the artifact
  * itself": the flag must reproduce the two observed driver-host
  * failure modes from their recorded numbers (r17's uniform CPU
  * starvation, r18's mid-run scheduler tier shift with CPU spotless),
  * stay clean on the recorded idle band, and FLIP when the same calib
  * loop is timed under deliberate background load. No SparkSession —
  * the verdict is pure arithmetic plus one real timed loop. */
class BenchSentinelSpec extends AnyFunSuite {

  test("tierVerdict: idle band reads clean; the r18 driver signature " +
      "(CPU spotless, job 0.182 pre vs 0.045 post) flags " +
      "scheduler_drift on the SHIFT; the r17 mode (uniform ~1.5x) " +
      "flags cpu_contended, which outranks job when both fire") {
    // idle builder-band values (PERF.md r18): spotless
    assert(Bench.tierVerdict(0.40, 0.42, 0.11, 0.14,
      0.46, 0.15)._1 === "clean")
    // r18 driver run: a FASTER host than the builder band (post job
    // 0.045), so no absolute band fires — the pre/post shift must
    val d = Bench.tierVerdict(0.383, 0.379, 0.182, 0.045, 0.46, 0.15)
    assert(d._1 === "scheduler_drift")
    assert(d._5 > 3.0) // job_shift ≈ 4.0
    // the recorded IDLE builder replica with the widest cold-pre vs
    // warm-post shift (2.78, bench_full_r18_5): the SHIFT alone must
    // not flag it — its elevated pre is the band ratio's job (1.35,
    // which labels the run scheduler_drift on absolute grounds, the
    // honest reading of an 0.203 s pre on a 0.10-0.15 band)
    val idle5 = Bench.tierVerdict(0.431, 0.382, 0.203, 0.073,
      0.46, 0.15)
    assert(idle5._1 === "scheduler_drift" && idle5._3 > 1.3 &&
      idle5._5 < 3.0)
    // the same shift on an in-band pair stays clean
    assert(Bench.tierVerdict(0.40, 0.40, 0.139, 0.050,
      0.46, 0.15)._1 === "clean")
    // r17 driver mode: uniform ~1.5x compute starvation
    assert(Bench.tierVerdict(0.62, 0.60, 0.16, 0.15,
      0.46, 0.15)._1 === "cpu_contended")
    // priority: starvation inflates the job sentinel too — the wider
    // diagnosis wins the label
    assert(Bench.tierVerdict(0.80, 0.80, 0.50, 0.50,
      0.46, 0.15)._1 === "cpu_contended")
    // steady job-band inflation without a shift still flags
    assert(Bench.tierVerdict(0.40, 0.41, 0.25, 0.24,
      0.46, 0.15)._1 === "scheduler_drift")
    // a degenerate zero measurement neuters the shift (never NaN),
    // and the band ratio alone decides
    val z = Bench.tierVerdict(0.40, 0.41, 0.0, 0.12, 0.46, 0.15)
    assert(z._1 === "clean" && z._5 === 1.0)
  }

  test("a deliberately LOADED host flips the flag: the same calib " +
      "loop under 3x-core background load reads far above its own " +
      "idle measurement") {
    val sink = new java.util.concurrent.atomic.AtomicLong
    val iters = 50000000 // ~0.1 s idle — enough signal, fast test
    def timeOnce(): Double = {
      val t0 = System.nanoTime()
      sink.addAndGet(Bench.calibWork(System.nanoTime(), iters))
      (System.nanoTime() - t0) / 1e9
    }
    sink.addAndGet(Bench.calibWork(1L, iters)) // JIT warmup, untimed
    val idle = (1 to 3).map(_ => timeOnce()).min
    val cores = Runtime.getRuntime.availableProcessors()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val load = (1 to cores * 3).map(_ => new Thread(() => {
      var x = 42L
      while (!stop.get()) {
        x = x * 6364136223846793005L + 1L; x ^= (x >>> 33)
      }
      sink.addAndGet(x); ()
    }))
    load.foreach { t => t.setDaemon(true); t.start() }
    val loaded =
      try (1 to 3).map(_ => timeOnce()).min
      finally { stop.set(true); load.foreach(_.join(2000)) }
    // 3N+1 runnable threads on N cores: the timed thread gets ~1/3
    // of a core — even with scheduler favoritism the inflation
    // clears the 1.3x band threshold with wide margin
    val v = Bench.tierVerdict(idle, loaded, 0.1, 0.1, idle, 1.0)
    assert(v._1 === "cpu_contended",
      f"loaded calib $loaded%.3f s vs idle $idle%.3f s did not flip " +
        "the flag")
    if (sink.get == 42L) println("sink (never prints)")
  }
}
