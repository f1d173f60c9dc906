package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for (a subset of) the
  * query inventory and flag plan smells — missing parquet filter
  * pushdown, non-broadcast dim joins, codegen fallbacks.
  *
  * Usage: sbt "runMain graft.tools.ExplainAudit [sfDir] [name ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"\n===================== $name =====================")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        println(plan)
        val smells = Seq(
          "PushedFilters: []" -> "scan with no pushed filters",
          "CartesianProduct" -> "cartesian product",
          "SortMergeJoin" -> "sort-merge join (check if broadcast fits)",
        ).collect { case (pat, msg) if plan.contains(pat) => s"  ! $msg" }
        if (smells.nonEmpty) println(smells.mkString("SMELLS:\n", "\n", ""))
      } catch {
        case e: Throwable => println(s"ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
