package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(spark, d)
      val cents = graft.sim.Ivf.train(emb, 8, 2)
      val t1 = System.nanoTime()
      graft.sim.Ivf.annIvf(emb, emb.filter(col("vec_id") < 10), 3, cents, 2).count()
      val t2 = System.nanoTime()
      println(f"run $i: train ${(t1-t0)/1e9}%.2f s, search ${(t2-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
