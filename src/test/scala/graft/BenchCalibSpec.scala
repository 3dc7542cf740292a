package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 calibration estimator's soundness properties — the r13
  * estimator (per-workload MIN across windows, jvm and spark paired
  * from DIFFERENT windows) produced a factor of 1.0813 on a run whose
  * per-window factors spanned 0.49–0.96: a machine condition that
  * existed at no point during the run. These tests make that defect
  * class unrepresentable. */
class BenchCalibSpec extends AnyFunSuite {
  private val ref = (0.46, 0.455)

  test("windowFactor pairs jvm and spark from the same window") {
    // machine exactly at reference condition → factor 1
    assert(math.abs(BenchCalib.windowFactor(ref._1, ref._2, 0.46, 0.455) - 1.0) < 1e-12)
    // uniformly 2× slower → factor 0.5 (normalization halves the time)
    assert(math.abs(BenchCalib.windowFactor(ref._1, ref._2, 0.92, 0.91) - 0.5) < 1e-12)
  }

  test("median: odd, even, singleton") {
    assert(BenchCalib.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchCalib.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(BenchCalib.median(Seq(7.0)) == 7.0)
  }

  test("sustained factor is <= burst factor (max window) by construction") {
    // the r13 judge's measured shape: every window slower than reference
    // (per-window factors 0.49–0.96), with jvm and spark minima landing
    // in DIFFERENT windows — the cross-window min estimator combined
    // them into 1.0813, above every real window
    val windows = Seq(
      (0.95, 0.47),  // fast jvm, slow spark
      (0.48, 0.93),  // slow jvm, fast spark
      (0.80, 0.75), (0.70, 0.88), (0.92, 0.60))
    val factors = windows.map { case (j, s) =>
      BenchCalib.windowFactor(ref._1, ref._2, j, s)
    }.toIndexedSeq
    val sustained = BenchCalib.median(factors)
    val burst = factors.max
    assert(sustained <= burst)
    assert(burst <= 1.0, "every window measured slower than reference, " +
      "so no sound factor can exceed 1.0")
    // the unsound r13 aggregation on the same windows DOES exceed every
    // real window — kept here as the counterexample the fix targets
    val r13Style = BenchCalib.windowFactor(ref._1, ref._2,
      windows.map(_._1).min, windows.map(_._2).min)
    assert(r13Style > factors.max)
  }

  test("entryFactor brackets the entry between its two windows") {
    val f = IndexedSeq(1.0, 0.25, 1.0)
    // entry after window 0, before window 1: geomean(1.0, 0.25) = 0.5
    assert(math.abs(BenchCalib.entryFactor(f, 0) - 0.5) < 1e-12)
    // entry after the final window clamps to it
    assert(BenchCalib.entryFactor(f, 2) == 1.0)
    assert(BenchCalib.entryFactor(f, 99) == 1.0)
    assert(math.abs(BenchCalib.entryFactor(f, -1) - 0.5) < 1e-12)
  }

  test("a mid-run contention burst corrects only the entries inside it") {
    // windows: quiet, contended (2x slow), quiet — entries in the
    // contended stretch normalize down, entries outside stay put
    val windows = IndexedSeq((0.46, 0.455), (0.92, 0.91), (0.46, 0.455))
    val factors = windows.map { case (j, s) =>
      BenchCalib.windowFactor(ref._1, ref._2, j, s)
    }
    val insideBurst = 10.0 * BenchCalib.entryFactor(factors, 0)
    val outsideBurst = 10.0 * BenchCalib.entryFactor(factors, 2)
    assert(insideBurst < 8.0)   // corrected toward reference condition
    assert(math.abs(outsideBurst - 10.0) < 1e-9) // untouched
  }

  test("medianWindow commits a real paired measurement") {
    // windows crafted so independent per-workload medians (0.5, 0.5)
    // correspond to NO real window — the r14-ADVICE unsoundness; the
    // median window by combined time is one of the measured pairs
    val windows = Seq((0.5, 0.9), (0.4, 0.5), (0.6, 0.3))
    val picked = BenchCalib.medianWindow(windows)
    assert(windows.contains(picked))
    // combined times: 0.45, 0.20, 0.18 → middle is (0.5, 0.9)...
    // sorted by product: (0.6,0.3)=0.18 < (0.4,0.5)=0.20 < (0.5,0.9)
    assert(picked === ((0.4, 0.5)))
    val independent = (BenchCalib.median(windows.map(_._1)),
      BenchCalib.median(windows.map(_._2)))
    assert(!windows.contains(independent)) // the defect this replaces
    // even count: lower-middle, still a real window
    val even = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
    assert(BenchCalib.medianWindow(even) === ((2.0, 2.0)))
  }
}
