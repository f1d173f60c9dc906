package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness — a REGRESSION GATE, not just a stopwatch.
  *
  * Guarantees (round-4 hardening):
  *   - a query that throws is recorded as a failure (name + exception) in
  *     the JSON and the process exits nonzero — a broken query can never
  *     bench as ~0s and pass unnoticed;
  *   - execution order is sorted by query name, so run-to-run JIT/GC
  *     history is identical regardless of Map hash layout;
  *   - `System.gc()` + a short settle between queries keeps one query's
  *     garbage from being collected on the next query's clock;
  *   - per-query spread (min/median/max over `runs`) is published in the
  *     artifact so variance is visible, not inferred.
  *
  * One JSON line on stdout:
  *   {"metric":"total","value":N,"unit":"sec","runs":R,
  *    "queries":{name:medianSec,...},
  *    "spread":{name:{"min":s,"median":s,"max":s},...},
  *    "failures":{name:"exception msg",...},"sf":"..."}
  */
object Bench {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** All `runs` timings (seconds), or the failure message of the first run
    * that threw. The FIRST run warms codegen/parquet footers for this query
    * and is included — the median discards it unless the query is genuinely
    * variance-free, which is the point of reporting medians.
    */
  private def timeRuns(runs: Int)(body: => Unit): Either[String, Seq[Double]] =
    try {
      Right((1 to runs).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      })
    } catch {
      case e: Throwable =>
        Left(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")
    }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // footer-stat COUNT/MIN/MAX: metadata-only scans where eligible
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // events.parquet stores TIMESTAMP(NANOS) — session-scoped, set at build
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths once (tiny sf) so the first
    // timed query doesn't absorb session startup; a warmup failure is real
    // (entry is the flagship query) and must surface, not vanish
    val warmupFailure =
      try { SparkEntry.entry(spark).count(); None }
      catch { case e: Throwable => Some(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}") }
    // optional comma-separated filter for targeted perf work
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
      .sorted // pinned order: hash-layout changes must not reshuffle JIT/GC history
    val timings = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    warmupFailure.foreach(msg => failures("_warmup_entry") = msg)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      timeRuns(runs) { fn(spark, sfDir).count() } match {
        case Right(ts) => timings(name) = ts
        case Left(msg) => failures(name) = msg
      }
      // settle: collect this query's garbage on its own time, not the next's
      System.gc()
      Thread.sleep(200)
    }
    val qs = timings.map { case (k, ts) => s"\"$k\":${median(ts)}" }
      .mkString("{", ",", "}")
    val spread = timings.map { case (k, ts) =>
      s"""\"$k\":{"min":${ts.min},"median":${median(ts)},"max":${ts.max}}"""
    }.mkString("{", ",", "}")
    val fails = failures.map { case (k, msg) => s"\"$k\":\"${jsonEscape(msg)}\"" }
      .mkString("{", ",", "}")
    val total = timings.values.map(median).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"spread":$spread,"failures":$fails,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"BENCH FAILURES (${failures.size}): ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
