package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKByScore == window row_number formulation, incl. ties, across partitions") {
    // deterministic data with deliberate score ties within groups
    val rows = for (g <- 0L until 20L; i <- 0L until 100L)
      yield (g, i, ((i * 7919 + g * 104729) % 50).toDouble)
    val df = rows.toDF("g", "id", "score").repartition(8)

    val viaAgg = df.groupBy(col("g").as("query_id"))
      .agg(TopK.topKByScore(col("score"), col("id"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("id"), col("p.score").as("score"))

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g").as("query_id"), col("rank"), col("id"), col("score"))

    val a = viaAgg.as[(Long, Int, Long, Double)].collect().toSet
    val b = viaWindow.as[(Long, Int, Long, Double)].collect().toSet
    assert(a == b)
    assert(a.size == 100) // 20 groups x 5
  }
}
