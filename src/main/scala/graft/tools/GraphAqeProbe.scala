package graft.tools

/** Dev probe (PageRankProbe convention): does the AQE
  * compressed-stats re-broadcast class that inverted plain pageRank
  * at 1e6 nodes (fixed r16 via the gated shuffle_hash pin) also bite
  * the OTHER iterative graph ops — hits, SCC, bow-tie — whose round
  * joins are the same node-shaped frame against edges? A/Bs each op
  * at the soak size under default conf vs auto-broadcast disabled,
  * printing wall + cpu + gc per run; a big default-vs-noBroadcast gap
  * with default burning MORE cpu is the signature.
  *
  * Usage: runMain graft.tools.GraphAqeProbe [nNodes] [runs]
  * (run with SPARK_DRIVER_MEM=32g — the 8g default measures GC on
  * accumulated checkpoint blocks, not the operators)
  */
object GraphAqeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = ScaleSoak.powerLawGraph(spark, n).localCheckpoint()
    println(s"edges: ${e.count()}")
    // per-size untimed warm-up (jit + adaptive plan shapes)
    val w = ScaleSoak.powerLawGraph(spark, 2000L).localCheckpoint()
    graft.ops.LinkGraph.hits(w).count()
    graft.ops.LinkGraph.stronglyConnectedComponents(w).count()
    graft.ops.LinkGraph.bowTie(w).count()
    graft.ops.LinkGraph.hits(e).count() // warm 1e6 plan shapes once

    def run(label: String): Unit = {
      for (mode <- Seq("hits", "scc", "bowtie"); r <- 1 to runs) {
        val c0 = JvmCounters.snap()
        val t0 = System.nanoTime()
        val res = mode match {
          case "hits" => graft.ops.LinkGraph.hits(e)
          case "scc" => graft.ops.LinkGraph.stronglyConnectedComponents(e)
          case _ => graft.ops.LinkGraph.bowTie(e)
        }
        res.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val d = JvmCounters.delta(c0, JvmCounters.snap())
        println(f"$label%-12s $mode%-7s run$r: $sec%7.2f s  " +
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
