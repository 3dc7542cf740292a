package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, printing one JSON line (total + per-query secs)
  * and writing the same line to SPARK_GRAFT_BENCH_OUT (default
  * `bench_out.json`) so a truncated stdout capture can't destroy the
  * round's numbers.
  *
  * JMH-style warmup: a small representative set of queries runs once
  * untimed (caches cleared after each) so the timed passes measure
  * steady-state engine throughput — the quantity that matters on a
  * long-lived cluster — rather than one-shot JVM/JIT/class-loading cost,
  * which on local[32] dominates first execution of the codegen-heavy
  * sketch pipelines (~7s of a 9s first run is C2 warmup). Queries run in
  * sorted name order for run-to-run stability, and every query is timed
  * TWICE with the per-query minimum reported: one noisy machine window
  * (cron, page cache eviction, CPU contention) then shifts a query's
  * number only if it hits the same query in both passes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: scan/agg/join path, text/sketch/window paths, vector path
    Seq("q02_date_range", "d_dup_clusters", "d_simhash_pairs",
        "d_ngram_jaccard", "ev_sessionization", "ann_ivf_topk").foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Machine-speed calibration, run before and after the timed passes:
    // r5→r7 showed a uniform ~1.3× cross-round drift (and a 1.37× swing
    // between two back-to-back identical runs) that is environment-level,
    // not plan-level. These two fixed workloads — a pure-JVM integer mix
    // (CPU clock/steal) and a fixed Spark shuffle micro-job (scheduler +
    // exchange health) — give later rounds a denominator to normalize
    // totals by before declaring a regression.
    def calibJvm(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 400000000L) { acc ^= i * 0x9e3779b97f4a7c15L + (acc >>> 17); i += 1 }
      if (acc == 42L) println("") // keep the loop observable
      (System.nanoTime() - t0) / 1e9
    }
    def calibSpark(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    // Calibration WINDOWS: the fixed workloads run before the passes,
    // after them, and every ~50 timed entries in between. r12 proved
    // two endpoint samples are not enough — the identical suite
    // normalized to 385.0 (r11) vs 440.9 (r12) on a zero-line diff
    // because a noisy endpoint window skewed the whole factor. The
    // factor now takes the per-workload MIN over all windows (see the
    // aggregation note below), and every window lands in the sidecar
    // so a drifting series is diagnosable after the fact.
    val calibWindows =
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def calibrate(): Unit = calibWindows += ((calibJvm(), calibSpark()))
    calibrate()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // A failed query must NEVER hide inside the total as a fast "success":
    // record the failure, report n_failed, and exit nonzero at the end.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timedPass(): Seq[(String, Double)] = names.zipWithIndex.map {
      case ((name, fn), i) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // isolate queries: drop any caches an operator pinned (e.g. the
        // jaccard shingle index) so later timings aren't memory-pressured
        spark.catalog.clearCache()
        if ((i + 1) % 50 == 0) calibrate()
        name -> dt
    }
    val pass1 = timedPass().toMap
    val pass2 = timedPass().toMap
    calibrate()
    // Normalization: times scale by (reference calib / measured calib),
    // geometric mean of the JVM and Spark probes, per-workload MIN
    // across all interleaved windows (see calibrate() above). The
    // reference constants are the r7 calibration mins — so
    // "normalized_total" answers "what would this run have cost on the
    // r7 judging machine", separating machine drift from plan changes
    // in one number.
    // The reference constants are COMMITTED (calibration_ref.json) so a
    // change to the calibration workloads can't silently desynchronize
    // them (r8 ADVICE): anyone editing calibJvm/calibSpark must
    // regenerate that file on the reference machine, or the normalized
    // number goes stale loudly in review rather than silently here.
    // Raw `value` stays the authoritative metric either way.
    // Resolved from SPARK_GRAFT_CALIB_REF, else the CWD — and the
    // fallback to built-in constants is LOUD (r9 ADVICE): a bench run
    // launched from the wrong directory warns on stderr instead of
    // silently reverting to stale normalization constants.
    val calibRefPath = sys.env.getOrElse("SPARK_GRAFT_CALIB_REF",
      "calibration_ref.json")
    val (calibRefJvm, calibRefSpark) = (try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(calibRefPath)), "UTF-8")
      def f(k: String): Option[Double] =
        ("\"" + k + "\"\\s*:\\s*([0-9.]+)").r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      (f("ref_jvm"), f("ref_spark")) match {
        case (Some(j), Some(s)) => Some((j, s))
        case _ => None
      }
    } catch { case _: Throwable => None }).getOrElse {
      System.err.println(s"[bench] WARNING: $calibRefPath unreadable; " +
        "normalizing with built-in fallback constants (0.460/0.455) — " +
        "normalized_total may be stale (raw total is unaffected)")
      (0.460, 0.455)
    }
    // Per-workload MIN across all windows (before, interleaved every
    // ~50 entries × 2 passes, after) — the same estimator as the
    // committed r7 reference mins, so the factor stays like-for-like
    // across rounds; more windows just make the min converge to the
    // machine's true capability. (A median here was measured and
    // rejected: it tracks transient load rather than capability, and
    // mismatches the min-based reference constants — back-to-back runs
    // agreed 3.0% under the median vs 0.1% under min-over-18.)
    val windowFactors = calibWindows.toSeq.map { case (j, s) =>
      math.sqrt((calibRefJvm / j) * (calibRefSpark / s))
    }
    val calibFactor = math.sqrt(
      (calibRefJvm / calibWindows.map(_._1).min) *
      (calibRefSpark / calibWindows.map(_._2).min))
    val windowsJson = calibWindows.toSeq.zip(windowFactors).map {
      case ((j, s), f) =>
        f"""{"jvm":$j%.3f,"spark":$s%.3f,"factor":$f%.4f}"""
    }.mkString("[", ",", "]")
    // stdout stays inside the driver's bounded capture window: compact
    // calib summary there, the full per-window series in the sidecar
    val calibCompact =
      f"""{"ref_jvm":$calibRefJvm%.3f,"ref_spark":$calibRefSpark%.3f,"n_windows":${calibWindows.size},"factor":$calibFactor%.4f,"agg":"min_over_windows"}"""
    val calibJson =
      f"""{"ref_jvm":$calibRefJvm%.3f,"ref_spark":$calibRefSpark%.3f,"n_windows":${calibWindows.size},"factor":$calibFactor%.4f,"agg":"min_over_windows","windows":$windowsJson}"""
    val results = names.map { case (n, _) => n -> math.min(pass1(n), pass2(n)) }
    val total = results.map(_._2).sum
    val normTotal = total * calibFactor
    // The driver keeps only a bounded tail of stdout (~2.3 KB): r2–r5 all
    // lost the head of this line (parsed:null) because per-query entries
    // push it past the window (even 40 entries ≈ 2.5 KB). The stdout line
    // therefore carries ONLY the all-query total, the count, and the 5
    // slowest queries (≈350 bytes); the sidecar file keeps every query at
    // full precision.
    def line(fmt: Double => String, subset: Seq[(String, Double)],
             withNormalized: Boolean): String = {
      val qs = subset.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // normalized per-query times land only in the sidecar (the stdout
      // line must stay inside the driver's bounded capture window)
      val qn = if (withNormalized)
        subset.map { case (k, v) => "\"" + k + "\":" + fmt(v * calibFactor) }
          .mkString(""","queries_normalized":{""", ",", "}")
      else ""
      val calib = if (withNormalized) calibJson else calibCompact
      s"""{"metric":"total","value":${fmt(total)},"normalized_total":${fmt(normTotal)},"unit":"sec","queries":$qs$qn,"sf":"$sfDir","passes":2,"agg":"min","n_queries":${results.size},"n_failed":${failed.size},"calib":$calib,"queries_shown":${subset.size},"full":"$outPath"}"""
    }
    val slowest5 = results.sortBy(-_._2).take(5).sortBy(_._1)
    println(line(v => f"$v%.3f", slowest5, withNormalized = false))
    try Files.writeString(Paths.get(outPath),
      line(_.toString, results, withNormalized = true) + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: " +
        failed.mkString(", "))
      sys.exit(1)
    }
  }
}
