package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: the d_lang_id_learned softmax loss trajectory +
  * agreement at a given sfDir — evidence for choosing the entry's
  * stopTol/iters budget (the disclosed tuning lever).
  *
  * Usage: runMain graft.tools.SoftmaxProbe [sfDir] [stopTol]
  */
object SoftmaxProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val stopTol = args.lift(1).map(_.toDouble).getOrElse(0.0)
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val langs = Seq("de", "en", "es", "fr", "zh")
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        concat(col("text"),
          expr("repeat(element_at(" +
            "map('en', ' the and', 'de', ' der und', 'es', ' el los', " +
            "'fr', ' le les', 'zh', ' 的 是'), lang), 8)"),
          lit(" ")).as("text"))
    val weak = graft.text.TextAnalysis.langId(docs)
      .select(col("doc_id"), col("pred_lang"))
    val langArr = array(langs.map(lit): _*)
    val labels = weak.select(col("doc_id"),
      (array_position(langArr, col("pred_lang")) - 1).cast("int").as("label"))
    val t0 = System.nanoTime()
    val m = graft.pipeline.TextClassifier.trainSoftmax(
      docs, labels, dim = 1 << 15, nClasses = langs.size,
      iters = 8, lr = 1.0, l1Normalize = false, sampleMax = 1000,
      stopTol = stopTol)
    val trainSec = (System.nanoTime() - t0) / 1e9
    println(f"epochs=${m.losses.size} train=$trainSec%.1fs losses=" +
      m.losses.map(l => f"$l%.6f").mkString(", "))
    val agg = graft.pipeline.TextClassifier.scoreSoftmax(docs, m)
      .join(labels, "doc_id")
      .agg(count(lit(1)).as("n"),
        count(when(col("cls") === col("label"), 1)).as("agree"))
      .first()
    println(s"docs=${agg.getLong(0)} agree=${agg.getLong(1)}")
    spark.stop()
  }
}
