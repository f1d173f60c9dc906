package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dev tool: EXECUTE a query and dump its FINAL adaptive plan — the
  * ground truth for exchange/stage reuse, which the compile-time
  * formatted plan cannot show (AQE reuses identical shuffle stages at
  * runtime; the pre-AQE tree prints the subtree once per consumer).
  *
  * Prints, per query: the final `AdaptiveSparkPlan isFinalPlan=true`
  * tree, plus counts of shuffle exchanges, broadcast exchanges,
  * ReusedExchange nodes, and table-scan stages actually executed.
  *
  * Usage: sbt "runMain graft.tools.RuntimePlan [sfDir] [name ...]"
  */
object RuntimePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d_bigram_logprob", "d_bm25_search")
    val spark = graft.GraftSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() executes THIS df's executedPlan (count() would build
      // and finalize a separate plan, leaving this one isFinalPlan=false)
      val n = df.collect().length
      // re-resolve the plan string AFTER execution: executedPlan now
      // holds the final adaptive tree with materialized reused stages
      // toString prints "== Final Plan ==" then "== Initial Plan ==";
      // count nodes in the FINAL section only (the one that executed)
      val full = df.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==").head
      def c(pat: String) = pat.r.findAllMatchIn(plan).length
      println(s"\n===================== $name (rows=$n) =====================")
      println(plan.take(12000))
      println(s"COUNTS: shuffleStages=${c("ShuffleQueryStage \\d+\n") + c("ShuffleQueryStage \\d+$")} " +
        s"liveExchanges=${c("\\+- Exchange ")} " +
        s"broadcastExchange=${c("BroadcastExchange")} " +
        s"reusedExchange=${c("ReusedExchange")} " +
        s"scans=${c("FileScan parquet")}")
    }
    spark.stop()
  }
}
