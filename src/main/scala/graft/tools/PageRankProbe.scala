package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (IvfProbe convention): attribute the graph-soak
  * inversion where PLAIN pageRank reads slower than the strictly-
  * heavier dangling variant at 1e6 nodes (SCALE_GRAPH.md r16: plain
  * 29.5 s / cpu 377-557 vs dangling 17.1 s / cpu 236-411 — more
  * CPU, so a plan difference, not environment). Suspects: AQE's
  * runtime broadcast decision on the per-round (edges x ranks) join
  * flipping with the ranks frame's size/compressibility, and the
  * probe-round plan shape. A/Bs plain vs dangling under default conf
  * and with auto-broadcast disabled, printing wall + cpu per run.
  *
  * Usage: runMain graft.tools.PageRankProbe [nNodes]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = ScaleSoak.powerLawGraph(spark, n).localCheckpoint()
    println(s"edges: ${e.count()}")
    // warm-up (JIT + codegen) on a small graph
    val w = ScaleSoak.powerLawGraph(spark, 2000L).localCheckpoint()
    graft.ops.LinkGraph.pageRank(w).count()
    graft.ops.LinkGraph.pageRank(w, redistributeDangling = true).count()

    def run(label: String): Unit = {
      for (mode <- Seq("plain", "dangling"); r <- 1 to 3) {
        val c0 = JvmCounters.snap()
        val t0 = System.nanoTime()
        val res =
          if (mode == "plain") graft.ops.LinkGraph.pageRank(e)
          else graft.ops.LinkGraph.pageRank(e, redistributeDangling = true)
        res.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val d = JvmCounters.delta(c0, JvmCounters.snap())
        println(f"$label%-12s $mode%-9s run$r: $sec%7.2f s  " +
          f"cpu=${d.cpuSec}%7.1f  gc=${d.gcMs}%5d ms  codegen=${d.codegenCompiles}")
        Console.out.flush()
      }
    }
    run("default")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    run("noBroadcast")
    spark.stop()
  }
}
