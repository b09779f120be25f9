package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Queries run in sorted-name order
  * after one untimed warmup query, so per-query numbers aren't polluted by
  * JVM/codegen warmup landing on whichever query ran first.
  *
  * Pollution control covers the WHOLE run, not just its start (round-4
  * lesson: the start gate passed at load1 1.7, ambient load ramped mid-run,
  * and per-query numbers came out 2-6× their idle values):
  *
  *  - Start gate (unchanged): refuse to start while load1 > threshold,
  *    bounded sleep-retry.
  *  - Per-query ambient-CPU stamp: loadavg is a 1-minute EMA that cannot
  *    separate the bench's own 32 threads from interference mid-run, so
  *    each query instead measures OTHER processes' CPU directly —
  *    (Δ system busy jiffies − Δ own-process jiffies) / wall — from
  *    /proc/stat and /proc/self/stat. That is exactly "what else the box
  *    was doing while this query ran", in cores.
  *  - Queries whose ambient exceeded [[AmbientCores]] are re-run once at
  *    the end (by then the interfering burst has usually passed); the
  *    reported time is the better of the two and the `reran` field names
  *    them so a reader knows which lines were contested.
  *  - A DRAM-bandwidth canary ([[probeMs]]) brackets every timing:
  *    out-of-VM interference (a neighboring guest saturating memory
  *    bandwidth) shows in neither loadavg nor jiffy accounting — it
  *    stretches this process's own cycles while it looks 100% busy. A
  *    query whose canary exceeded [[ProbeRatio]]× the run's floor is
  *    contested exactly like an ambient-CPU hit; per-query `canary_ms` +
  *    `canary_floor_ms` land in the JSON so a reader can discard any
  *    line timed in a bad window.
  *  - The JSON line is also written to a FILE (SPARK_GRAFT_BENCH_OUT, or
  *    BENCH_LAST.json in cwd) — log-tail capture truncated 21 of 79
  *    queries from BENCH_r04; the file artifact cannot be.
  *  - Each query is timed TWICE: the first run carries per-plan
  *    analysis + whole-stage-codegen compile (fixed driver-side cost,
  *    not data work), the second is the steady state a long-running
  *    server serves. `queries`/`value` report the better of the two,
  *    `queries_cold` preserves the first-run numbers.
  *
  *  - Fit-bearing queries (the memoized logistic / k-means / PQ families)
  *    used to make whichever of them ran FIRST look pathological — the
  *    in-suite number carried the whole family's cold fit (r10: x139
  *    21 s in-suite vs 0.84 s isolated). The fits are now PRE-WARMED
  *    untimed before pass 1 and their one-off cost is reported as its
  *    own `fit_warm_sec` line item, so per-query numbers measure the
  *    query, and the fit cost stays visible instead of being smeared
  *    into a random victim.
  *
  * Optional args: a subset of query names to run (local iteration);
  * a trailing `*` prefix-globs (`x1*`, `a*` — the documented fast-path
  * capture is `Bench a* b*` plus the names just changed); no args = the
  * full suite (driver contract).
  *
  * Stdout contract: exactly ONE `"metric":"total"` JSON line — compact
  * (headline + slowest-10 queries), always complete under tail-truncated
  * capture. The FULL per-query map goes to SPARK_GRAFT_BENCH_OUT
  * (default BENCH_LAST.json), never to stdout: round-artifact capture
  * keeps only a ~2000-char stdout tail, and a 240-query map truncates
  * mid-object and parses as null (BENCH_r09/r10 lesson).
  */
object Bench {

  /** One cheap representative per memoized fit family (Fitted.key algo):
    * qlr → x88, qlrcv (5 folds) → x201, ivf → x13, pq/ivfpq → x51/x52,
    * pca → x204. Run untimed before pass 1 so no suite query pays a
    * family's fit.
    */
  val FitWarmers: Seq[String] = Seq("x88_model_auc", "x201_cv_auc",
    "x13_knn_ivf", "x51_knn_pq", "x52_knn_ivfpq", "x204_pca_whitening")

  /** Ambient (non-bench) CPU, in cores, above which a query's timing is
    * considered contested and re-run once at the end of the suite.
    */
  val AmbientCores = 2.0

  /** A query is also contested when the bandwidth canary ([[probeMs]]) ran
    * slower than this multiple of the run's observed floor while the query
    * was being timed.
    */
  val ProbeRatio = 1.4

  /** 64 MB of longs — larger than any LLC here, so streaming over it is
    * DRAM-bound and its wall time tracks the memory bandwidth actually
    * available to this VM at that moment.
    */
  private lazy val probeArr: Array[Long] = Array.tabulate(8 << 20)(_.toLong)
  @volatile private var probeSink = 0L

  /** The NOISY-NEIGHBOR canary: ms to stream-sum 64 MB, best of 3.
    *
    * Round-5 lesson: x43 timed 57 s on one run and 3.8 s on another with
    * load1 < 2 at the gate AND per-query ambient_cores ≈ 0 — interference
    * from OUTSIDE the VM (another guest saturating memory bandwidth) is
    * invisible to loadavg and to jiffy accounting, because jiffies measure
    * time scheduled, not work done: contention stretches cycles while this
    * process appears 100% busy. A fixed DRAM-bound sweep measures the
    * symptom directly — when the canary is slow, every timing taken in
    * that window is untrustworthy, whatever /proc/stat says.
    */
  private def probeMs(): Double = {
    var best = Double.MaxValue
    var r = 0
    while (r < 3) {
      val t0 = System.nanoTime(); var s = 0L; var i = 0
      while (i < probeArr.length) { s += probeArr(i); i += 1 }
      probeSink = s
      best = math.min(best, (System.nanoTime() - t0) / 1e6)
      r += 1
    }
    best
  }

  private def load1: Option[Double] =
    try Some(java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .trim.split("\\s+")(0).toDouble)
    catch { case _: Throwable => None }

  /** (system busy jiffies across all cpus, this process's jiffies).
    * Busy excludes idle (field 4) and iowait (field 5). /proc/self/stat's
    * comm field may contain spaces, so fields are taken after the last ')'
    * (utime/stime are then 0-based fields 11/12).
    */
  private def cpuSample(): Option[(Long, Long)] = try {
    val sys0 = java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/stat"))
      .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
    val busy = sys0.zipWithIndex.collect {
      case (v, i) if i != 3 && i != 4 => v }.sum
    val selfStat = java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/self/stat"))
    val after = selfStat.substring(selfStat.lastIndexOf(')') + 2)
      .trim.split("\\s+")
    Some((busy, after(11).toLong + after(12).toLong))
  } catch { case _: Throwable => None }

  /** Load-gate: ambient load swings bench totals 2-3× on a shared box
    * (three rounds of BENCH files needed an idle re-run to interpret), so
    * REFUSE to start while load1 exceeds the threshold — sleep-retry a
    * bounded number of times and report how long we waited. If the box
    * never quiets down we run anyway (a stamped-but-noisy line beats no
    * line) — the emitted `load1` field still tells the reader.
    */
  private def awaitQuietBox(threshold: Double, maxAttempts: Int,
      sleepSec: Int): Int = {
    var attempts = 0
    while (attempts < maxAttempts && load1.exists(_ > threshold)) {
      System.err.println(s"[bench] load1=${load1.getOrElse(-1.0)} > " +
        s"$threshold; waiting ${sleepSec}s (${attempts + 1}/$maxAttempts)")
      Thread.sleep(sleepSec * 1000L)
      attempts += 1
    }
    attempts
  }

  /** Run one query; returns (wall sec, ambient cores, canary ms) — the
    * canary brackets the timing (worse of before/after), so interference
    * at any point inside the window is caught.
    */
  private def timeOne(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
    val p0 = probeMs()
    val c0 = cpuSample()
    val t0 = System.nanoTime()
    try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
    val dt = (System.nanoTime() - t0) / 1e9
    // release operator-persisted intermediates between queries so cached
    // blocks don't accumulate across the run (storage-memory churn)
    graft.engine.CacheScope.drain()
    val ambient = (for { (b0, s0) <- c0; (b1, s1) <- cpuSample() } yield {
      val hz = 100.0 // USER_HZ; Linux fixes this at 100 on all common arches
      math.max(0.0, ((b1 - b0) - (s1 - s0)) / hz / math.max(dt, 1e-3))
    }).getOrElse(-1.0)
    (dt, ambient, math.max(p0, probeMs()))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gateAttempts = awaitQuietBox(threshold = 2.0, maxAttempts = 20,
      sleepSec = 30)
    // ambient load BEFORE Spark starts: the end-of-run stamp includes the
    // bench's own 32 threads (a 95 s burst alone pushes load1 to 3-6), so
    // only the pre-run number measures what ELSE the box was doing
    val loadStart = load1.getOrElse(-1.0)
    // canary baseline before Spark's threads exist — one candidate for the
    // floor (the floor is the min over the whole run: if the box was
    // contended even now, some later quiet-window probe will beat this)
    val probeBase = probeMs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("a03_summary")(spark, sfDir).count() // warmup
    catch { case _: Throwable => }
    def argMatch(name: String): Boolean = args.isEmpty || args.exists(a =>
      if (a.endsWith("*")) name.startsWith(a.dropRight(1)) else name == a)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => argMatch(q._1))
    // pre-warm the memoized fit families (untimed, cost reported as its
    // own line item) whenever a selected query could hit one — i.e. the
    // full suite, or a subset naming any x-family query
    val warmFits = args.isEmpty || selected.exists(_._1.startsWith("x"))
    val fitWarmSec = if (!warmFits) 0.0 else {
      val t0 = System.nanoTime()
      FitWarmers.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => }
      }
      graft.engine.CacheScope.drain()
      (System.nanoTime() - t0) / 1e9
    }
    // two passes per query: pass 1 is COLD (plan + codegen compile land on
    // the timing), pass 2 is the steady state a long-running server
    // actually serves. Both are reported; the headline `queries`/`value`
    // numbers are steady-state, `queries_cold` keeps the first-run cost
    // visible (cold minus steady ≈ fixed per-plan compile, not data work).
    val allProbes = scala.collection.mutable.ArrayBuffer(probeBase)
    val firstPass = selected.map { case (name, fn) =>
      val (cold, ambientCold, probeCold) = timeOne(spark, sfDir, fn)
      val (dt, ambient, probeWarm) = timeOne(spark, sfDir, fn)
      allProbes += probeCold; allProbes += probeWarm
      // keep the better run WITH its own trust stamps (the quieter window's
      // canary belongs to the time we report)
      val (steady, amb, prb) =
        if (dt <= cold) (dt, ambient, probeWarm)
        else (cold, ambientCold, probeCold)
      (name, fn, steady, amb, cold, prb)
    }
    // trust floor: best canary seen ANYWHERE in the run — pre-Spark and
    // both first-pass runs, not just the chosen ones (a floor built only
    // from kept-run probes overestimates and under-detects contention)
    val floor = allProbes.min
    // second chance for contested lines — ambient CPU visible in jiffies OR
    // a slow canary (out-of-VM interference jiffies can't see): wait for
    // the burst to pass, re-run, keep the better time (a re-run can itself
    // be hit)
    def isContested(amb: Double, prb: Double): Boolean =
      amb > AmbientCores || prb > ProbeRatio * floor
    val contested = firstPass.filter(r => isContested(r._4, r._6))
    contested.foreach { r =>
      System.err.println(f"[bench] ${r._1} contested: ambient=${r._4}%.1f " +
        f"cores, canary=${r._6}%.1f ms (floor $floor%.1f)")
    }
    if (contested.nonEmpty) awaitQuietBox(threshold = 2.0, maxAttempts = 10,
      sleepSec = 30)
    val reruns: Map[String, (Double, Double, Double)] = contested.map {
      case (name, fn, _, _, _, _) =>
        System.err.println(s"[bench] re-running contested $name")
        name -> timeOne(spark, sfDir, fn)
    }.toMap
    val results = firstPass.map { case (name, _, dt, ambient, cold, prb) =>
      reruns.get(name) match {
        case Some((dt2, amb2, prb2)) if dt2 < dt => (name, dt2, amb2, cold, prb2)
        case _ => (name, dt, ambient, cold, prb)
      }
    }
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, _, _, c, _) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    // Locale.ROOT formatting: the f-interpolator uses the default locale,
    // and a comma-decimal locale would emit invalid JSON ("7,3")
    def num(pattern: String, v: Double): String =
      String.format(java.util.Locale.ROOT, pattern, Double.box(v))
    val ambients = results.map { case (k, _, a, _, _) =>
      s"\"" + k + "\":" + num("%.2f", a) }.mkString("{", ",", "}")
    val probes = results.map { case (k, _, _, _, p) =>
      s"\"" + k + "\":" + num("%.1f", p) }.mkString("{", ",", "}")
    val reranNames = contested.map(c => s"\"${c._1}\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // machine-state stamp: ambient load swings totals 2-3x on this box, so
    // a bench line is only interpretable next to the load it ran under
    val load = try {
      val parts = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")
      s""","load1":${parts(0)},"load5":${parts(1)},"load15":${parts(2)}"""
    } catch { case _: Throwable => "" }
    val up = try {
      val secs = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/uptime")).trim.split("\\s+")(0)
      s""","uptime_sec":$secs"""
    } catch { case _: Throwable => "" }
    val gate = s""","load1_start":$loadStart,"load_gate_attempts":$gateAttempts,"load_gate_threshold":2.0"""
    val ambientStamp =
      s""","ambient_cores":$ambients,"ambient_threshold":$AmbientCores,"reran":$reranNames""" +
        s""","canary_ms":$probes,"canary_floor_ms":${num("%.1f", floor)},"canary_ratio_threshold":$ProbeRatio"""
    val fitStamp = s""","fit_warm_sec":${num("%.2f", fitWarmSec)},"fit_warmers":${FitWarmers.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val coldStamp = s""","queries_cold":$colds,"timing":"steady_state_best_of_2""""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$load$up$gate$ambientStamp$fitStamp$coldStamp}"""
    // full per-query map goes ONLY to the file artifact: stdout/log-tail
    // capture truncated BENCH_r04/r09/r10; the file version is always
    // complete, and keeping the full line OFF stdout leaves exactly one
    // "metric":"total" stdout line for consumers to grab
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write file artifact: $e") }
    // the ONE stdout JSON line: a complete compact object small enough to
    // always fit a ~2000-char stdout tail — headline cube queries + the
    // suite's slowest 10 + the trust stamps; the full per-query map lives
    // in the file artifact named by `queries_full`.
    val compactQs = (results.filter(_._1.startsWith("a")) ++
        results.sortBy(-_._2).take(10))
      .distinctBy(_._1).sortBy(_._1)
      .map { case (k, v, _, _, _) => "\"" + k + "\":" + num("%.3f", v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${num("%.3f", total)},""" +
      s""""unit":"sec","sf":"$sfDir","suite_n":${results.size},""" +
      s""""queries":$compactQs,"queries_full":"$outPath"""" +
      s""","fit_warm_sec":${num("%.2f", fitWarmSec)}""" +
      s"""$load$gate,"canary_floor_ms":${num("%.1f", floor)}}""")
    spark.stop()
  }
}
