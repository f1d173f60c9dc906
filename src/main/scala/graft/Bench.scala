package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark harness — a REGRESSION GATE, not just a stopwatch.
  *
  * Guarantees (round-4/5 hardening):
  *   - a query that throws is recorded as a failure (name + exception) and
  *     the process exits nonzero — a broken query can never bench as ~0s
  *     and pass unnoticed; runs completed before the failure are kept so
  *     an intermittent failure still leaves timing evidence;
  *   - only `NonFatal` errors are caught per-query; an OutOfMemoryError or
  *     similar fatal condition aborts the whole bench (timings taken after
  *     a fatal error would be garbage);
  *   - execution order is sorted by query name, so run-to-run JIT/GC
  *     history is identical regardless of Map hash layout;
  *   - `System.gc()` + a short settle between queries keeps one query's
  *     garbage from being collected on the next query's clock;
  *   - an unknown name in SPARK_GRAFT_BENCH_ONLY is an error, not a silent
  *     empty (and green-looking) bench.
  *
  * Output protocol: the LAST stdout line is ONE compact JSON object
  *   {"metric":"total","value":N,"unit":"sec","runs":R,
  *    "queries":{name:medianSec,...},"failures":F,"sf":"..."}
  * with seconds at 3 decimals so the whole line stays well under the
  * driver's 2000-char output-tail window (the round-4 artifact proved a
  * long line gets cut and the headline is lost). Full detail — per-run
  * timings, min/median/max spread, failure messages — goes to
  * BENCH_DETAIL.json in the working directory and to stderr.
  */
object Bench {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  /** Timings for runs that completed, plus the failure message of the run
    * that threw (if any); runs after a failure are not attempted. The FIRST
    * run warms codegen/parquet footers for this query and is included — the
    * median discards it unless the query is genuinely variance-free, which
    * is the point of reporting medians.
    */
  private def timeRuns(runs: Int, onRun: Int => Unit = _ => ())(body: => Unit): (Seq[Double], Option[String]) = {
    val done = Seq.newBuilder[Double]
    var i = 0
    while (i < runs) {
      onRun(i)
      val t0 = System.nanoTime()
      try body
      catch {
        case NonFatal(e) =>
          return (done.result(), Some(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"))
      }
      done += (System.nanoTime() - t0) / 1e9
      i += 1
    }
    (done.result(), None)
  }

  /** Total GC milliseconds across all collector beans of this JVM —
    * in local mode the driver JVM IS the executors, so a delta of this
    * around a run is the run's whole GC bill (including work the stage
    * labels misattribute).
    */
  private def jvmGcMs(): Long = graft.tools.JvmCounters.gcMs()

  /** Whole-stage-codegen compilations so far in this JVM (count, total
    * bytecode bytes). A nonzero per-run delta on a STEADY-STATE run
    * means the generated-class cache is missing — each miss serializes
    * every task of the stage behind one Janino compile.
    */
  private def codegenStats(): (Long, Long) =
    graft.tools.JvmCounters.codegenStats()

  /** Total JIT compilation milliseconds so far in this JVM. Paired
    * with the GC and process-CPU deltas per run, it attributes
    * cross-session drift: a run whose wall grew but whose cpu_sec
    * tracked wall is thermal/contention; cpu_sec flat + jit_ms high is
    * warm-up; gc_ms high is allocation pressure.
    */
  private def jvmJitMs(): Long = graft.tools.JvmCounters.jitMs()

  /** Cumulative process CPU seconds (all threads — in local mode the
    * executors live here, so this is the whole compute bill).
    */
  private def processCpuSec(): Double = graft.tools.JvmCounters.cpuSec()

  /** Median with the even-n midpoint averaged (not the biased upper-middle). */
  private def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty seq")
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  // Locale.ROOT: under a comma-decimal default locale the f-interpolator
  // would emit "1,234" and corrupt the JSON contract line
  private def f3(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
  private def f6(d: Double): String = String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // CONTENDED mode (SPARK_GRAFT_BENCH_CONTEND=N): N daemon threads of
    // pure-JVM CPU churn + allocation pressure run for the WHOLE bench
    // (calibration included, so the calib block reflects the load the
    // numbers were taken under) — the regression harness for the
    // busy-box failure mode the round-12 driver rerun exposed, where
    // unpersisted iterative lineage inflated 9-27x while everything
    // else tracked the calibration. Detail goes to BENCH_CONTENDED.json
    // so a contended run can never masquerade as (or clobber) the
    // canonical quiet-box BENCH_DETAIL.json artifact.
    val contend = sys.env.get("SPARK_GRAFT_BENCH_CONTEND")
      .map(_.trim.toInt).getOrElse(0)
    require(contend >= 0, s"SPARK_GRAFT_BENCH_CONTEND must be >= 0, got $contend")
    @volatile var stopLoad = false
    val loadSink = new java.util.concurrent.atomic.AtomicLong
    val loadThreads = (0 until contend).map { i =>
      val t = new Thread(() => {
        val rnd = new java.util.Random(i)
        while (!stopLoad) {
          val arr = new Array[Long](1 << 20) // 8 MiB of fresh garbage
          var j = 0
          while (j < arr.length) {
            arr(j) = rnd.nextLong() ^ (arr((j * 31) % arr.length) * 0x9E3779B97F4A7C15L)
            j += 1
          }
          loadSink.addAndGet(arr(rnd.nextInt(arr.length)))
        }
      })
      t.setDaemon(true)
      t.setName(s"graft-contend-$i")
      t.start()
      t
    }
    val traceOn = sys.env.get("SPARK_GRAFT_BENCH_TRACE").exists(v => v == "1" || v == "true")
    // GraftSession carries the bench-proven perf confs (codegen-class
    // cache sized for iterative plan families, parquet footer-stat
    // pushdown) — the library surface and this harness share one
    // source of truth. The confs below are harness/testdata-specific.
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/ScaleSoak: a MICROS-generation events file read
      // as TIMESTAMP_NTZ would otherwise bucket by host timezone here
      // and by UTC in the oracle run (ADVICE r9)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS) — session-scoped, set at build
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // opt-in per-stage trace (SPARK_GRAFT_BENCH_TRACE=1) → BENCH_TRACE.json;
    // labels each stage with the (query,run) active at submission and logs a
    // driver-JVM GC delta per run — evidence for in-suite variance hunts
    val tracer = if (traceOn) Some(new graft.tools.BenchTraceListener) else None
    tracer.foreach(spark.sparkContext.addSparkListener)
    val runMeta = Seq.newBuilder[(String, Double, Long, Long)]
    // warm the JVM/codegen/parquet-footer paths once (tiny sf) so the first
    // timed query doesn't absorb session startup; a warmup failure is real
    // (entry is the flagship query) and must surface, not vanish
    val warmupFailure =
      try { SparkEntry.entry(spark).count(); None }
      catch { case NonFatal(e) => Some(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}") }
    // fixed CALIBRATION workload, timed at suite start and end: a
    // deterministic CPU+shuffle job independent of the suite and the
    // data. Round 11 measured identical-code full-suite sums drifting
    // 46→54 s across one session at flat load-average — dividing suite
    // times by the calibration time turns cross-session comparisons
    // back into code comparisons. Median of 3 so one GC pause can't
    // skew the normalizer.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(8000000L)
        .selectExpr("xxhash64(id) AS h", "id % 1024 AS k")
        .repartition(cpus.toInt, org.apache.spark.sql.functions.col("k"))
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("h"))
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
        .head()
      (System.nanoTime() - t0) / 1e9
    }
    def calibrate(): Double = {
      val ts = Seq.fill(3)(calibOnce()).sorted
      ts(1)
    }
    // fixed-work DECODE microprobe, tracked alongside the shuffle calib:
    // a pure-JVM loop of real GIF + WAV decodes over constant payloads
    // (no Spark scheduling, no allocation churn beyond the decoders'
    // own) — pins whether media/decode-family drift is decoder-side
    // (probe moves with the family: JIT/thermal/cpu-clock) or
    // plan-side (probe flat while the family drifts). r14 watched
    // m_image_dedup/d_shot_detect drift across sessions with untouched
    // code; this makes the attribution mechanical.
    val probeGif = graft.mm.Multimodal.grayPixelGif(
      (0 until 72).map(p => (p * 37) % 256), 9, 8)
    val probeWav = graft.mm.Multimodal.pcmWavU8(
      (0 until 512).map(i => (i * 73) % 256))
    def decodeProbeOnce(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0L
      while (i < 400) {
        sink ^= graft.mm.Multimodal.dhash64(probeGif).map(_._3).getOrElse(0L)
        sink ^= graft.mm.Multimodal.decodeAudio(probeWav)
          .map(_.nFrames).getOrElse(0L)
        i += 1
      }
      if (sink == 42L) System.err.println("") // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    def decodeProbe(): Double = {
      val ts = Seq.fill(3)(decodeProbeOnce()).sorted
      ts(1)
    }
    val calibStart = try calibrate() catch { case NonFatal(_) => -1.0 }
    val decodeStart = try decodeProbe() catch { case NonFatal(_) => -1.0 }
    // also warm the parquet WRITE path: staging operators (Lttb) are the
    // only writers in the suite, and without this their first 2-3 timed
    // runs absorb the whole FileFormatWriter/compression JIT bill —
    // measured as 5x first-run modes that a long-lived app never sees
    try {
      val wdir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-bench-warmup-${java.util.UUID.randomUUID()}"
      spark.range(10000).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .repartition(cpus.toInt).write.mode("overwrite").parquet(wdir)
      spark.read.parquet(wdir).count()
      val p = new org.apache.hadoop.fs.Path(wdir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    } catch { case NonFatal(_) => () } // warmup-only: never fails the bench
    // optional comma-separated filter for targeted perf work; a name that
    // matches no query is an error — a typo must not produce an empty bench
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { req =>
      val unknown = req.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
      .sorted // pinned order: hash-layout changes must not reshuffle JIT/GC history
    // CALIBRATION INTERLEAVE: the fixed probe re-runs every
    // `calibEvery` queries (one pass, ~0.7 s — wall-clock only, never
    // on a query's clock), so a mid-suite external burst lands in the
    // calib TRACK instead of silently poisoning whichever medians it
    // overlapped. Each query records the most recent probe as its
    // window's calibration (calib_win); adjudication rule: a query
    // whose calib_win reads >=1.5x calib_start ran in a contaminated
    // window — judge it from the committed quiet artifact, not this
    // run. 0 disables the interleave.
    val calibEvery = sys.env.get("SPARK_GRAFT_BENCH_CALIB_EVERY")
      .map(_.trim.toInt).getOrElse(8)
    require(calibEvery >= 0, s"SPARK_GRAFT_BENCH_CALIB_EVERY must be >= 0, got $calibEvery")
    val calibTrack = Seq.newBuilder[(String, Double)]
    calibTrack += (("_start", calibStart))
    calibTrack += (("decode:_start", decodeStart))
    var curWinCalib = calibStart
    val winCalib = scala.collection.mutable.LinkedHashMap[String, Double]()
    // per-run process counters (gc ms, jit ms, process-cpu sec, codegen
    // compiles), emitted with each query's spread block — the drift
    // attribution the r14 media/decode watch item asked for: wall up
    // with cpu flat = contention/thermal; jit/gc up = JVM-side
    val runCounters = scala.collection.mutable.LinkedHashMap[
      String, (Seq[Long], Seq[Long], Seq[Double], Seq[Long])]()
    val timings = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    warmupFailure.foreach(msg => failures("_warmup_entry") = msg)
    names.zipWithIndex.foreach { case (name, qi) =>
      if (calibEvery > 0 && qi > 0 && qi % calibEvery == 0) {
        tracer.foreach { t =>
          spark.sparkContext.setLocalProperty(
            graft.tools.BenchTrace.LabelProp, s"_calib_before_$name")
          t.setLabel(s"_calib_before_$name")
        }
        val c = try calibOnce() catch { case NonFatal(_) => -1.0 }
        calibTrack += ((s"before:$name", c))
        val dp = try decodeProbeOnce() catch { case NonFatal(_) => -1.0 }
        calibTrack += ((s"decode:before:$name", dp))
        if (c > 0) curWinCalib = c
      }
      winCalib(name) = curWinCalib
      val fn = SparkEntry.queries(name)
      // one DISCARDED warm pass per query before the measured runs: the
      // driver's full-suite runs showed 1.5-2x first-run modes on
      // queries untouched between rounds (q1_agg, m_resize — r9) purely
      // from suite-order JIT/codegen history; isolating each query's
      // warmup on its own unmeasured pass makes medians comparable
      // across rounds regardless of which queries sit before it. A
      // warmup failure is not swallowed: the measured runs hit it too.
      tracer.foreach { t =>
        spark.sparkContext.setLocalProperty(
          graft.tools.BenchTrace.LabelProp, s"_warm_$name")
        t.setLabel(s"_warm_$name")
      }
      try fn(spark, sfDir).count() catch { case NonFatal(_) => () }
      val perRunGc = Seq.newBuilder[Long]
      val perRunJit = Seq.newBuilder[Long]
      val perRunCpu = Seq.newBuilder[Double]
      val perRunCompiles = Seq.newBuilder[Long]
      val (ts, fail) = timeRuns(runs,
        i => tracer.foreach { t =>
          // the local property rides each job's submission event (exact
          // stage attribution); setLabel covers property-less events
          spark.sparkContext.setLocalProperty(
            graft.tools.BenchTrace.LabelProp, s"$name#$i")
          t.setLabel(s"$name#$i")
        }) {
        val g0 = jvmGcMs()
        val j0 = jvmJitMs()
        val p0 = processCpuSec()
        val (c0, _) = codegenStats()
        fn(spark, sfDir).count()
        perRunGc += jvmGcMs() - g0
        perRunJit += jvmJitMs() - j0
        perRunCpu += processCpuSec() - p0
        perRunCompiles += codegenStats()._1 - c0
      }
      if (ts.nonEmpty) timings(name) = ts
      val (gcs, jits, cpus_, compiles) = (perRunGc.result(),
        perRunJit.result(), perRunCpu.result(), perRunCompiles.result())
      runCounters(name) = (gcs, jits, cpus_, compiles)
      fail.foreach(msg => failures(name) = msg)
      if (tracer.nonEmpty)
        runMeta ++= ts.zip(gcs).zip(compiles).zipWithIndex.map {
          case (((w, g), c), i) => (s"$name#$i", w, g, c)
        }
      tracer.foreach { t =>
        spark.sparkContext.setLocalProperty(
          graft.tools.BenchTrace.LabelProp, s"_settle_after_$name")
        t.setLabel(s"_settle_after_$name")
      }
      // settle: collect this query's garbage on its own time, not the next's
      System.gc()
      Thread.sleep(200)
    }
    tracer.foreach { t =>
      Thread.sleep(300) // let the listener bus drain the last events
      graft.tools.BenchTrace.write("BENCH_TRACE.json", t, runMeta.result())
      System.err.println(s"BENCH_TRACE -> ${java.nio.file.Paths.get("BENCH_TRACE.json").toAbsolutePath}")
    }
    // queries/total cover only fully-clean queries so totals stay comparable;
    // a failed query's partial timings live in the detail file, and rc!=0
    // plus the failure count in the headline make the breakage visible
    val clean = timings.filter { case (k, _) => !failures.contains(k) }
    val total = clean.values.map(median).sum
    val qs = clean.map { case (k, ts) => s"\"$k\":${f3(median(ts))}" }
      .mkString("{", ",", "}")
    val spread = timings.map { case (k, ts) =>
      val runsJson = ts.map(f6).mkString("[", ",", "]")
      val cw = winCalib.getOrElse(k, -1.0)
      val counters = runCounters.get(k).map { case (g, j, c, n) =>
        s""","gc_ms":${g.mkString("[", ",", "]")}""" +
          s""","jit_ms":${j.mkString("[", ",", "]")}""" +
          s""","cpu_sec":${c.map(f3).mkString("[", ",", "]")}""" +
          s""","codegen_compiles":${n.mkString("[", ",", "]")}"""
      }.getOrElse("")
      s"""\"$k\":{"min":${f6(ts.min)},"median":${f6(median(ts))},"max":${f6(ts.max)},"calib_win":${f3(cw)},"runs":$runsJson$counters}"""
    }.mkString("{", ",", "}")
    val fails = failures.map { case (k, msg) => s"\"$k\":\"${jsonEscape(msg)}\"" }
      .mkString("{", ",", "}")
    // host-contention metadata: a contended run (another heavy process
    // sharing the box) self-identifies instead of masquerading as a
    // code regression — round 10's driver rerun showed uniform 2-4x
    // inflation on sub-second queries from exactly this
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadEnd = osBean.getSystemLoadAverage
    val nProcs = Option(new java.io.File("/proc").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.forall(_.isDigit)))
      .getOrElse(-1)
    val calibEnd = try calibrate() catch { case NonFatal(_) => -1.0 }
    calibTrack += (("_end", calibEnd))
    val decodeEnd = try decodeProbe() catch { case NonFatal(_) => -1.0 }
    calibTrack += (("decode:_end", decodeEnd))
    val track = calibTrack.result().map { case (at, c) =>
      s"""["${jsonEscape(at)}",${f3(c)}]"""
    }.mkString("[", ",", "]")
    stopLoad = true
    loadThreads.foreach(_.join(2000))
    val host =
      s""""host":{"cores":${osBean.getAvailableProcessors},"load_avg_end":${f3(loadEnd)},"proc_count":$nProcs,"contend":$contend,"calib_start_sec":${f3(calibStart)},"calib_end_sec":${f3(calibEnd)}}"""
    val detail =
      s"""{"runs":$runs,"cpus":$cpus,"sf":"$sfDir",$host,"calib_track":$track,"total":${f6(total)},"spread":$spread,"failures":$fails}"""
    val detailPath = java.nio.file.Paths.get(
      if (contend > 0) "BENCH_CONTENDED.json" else "BENCH_DETAIL.json")
    java.nio.file.Files.write(detailPath, (detail + "\n").getBytes("UTF-8"))
    System.err.println(s"BENCH_DETAIL -> ${detailPath.toAbsolutePath}")
    System.err.println(detail)
    spark.stop()
    // contract line LAST on stdout, compact, after spark.stop() so no late
    // log line can land between it and process exit
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,"queries":$qs,"failures":${failures.size},"sf":"$sfDir"}""")
    if (failures.nonEmpty) {
      System.err.println(s"BENCH FAILURES (${failures.size}): ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
