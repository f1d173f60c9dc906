package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: attribute d_dedup_containment's super-linear 16-32x
  * soak ratio (r16 octave: cpu 36 -> 2958 s for 32x volume). Counts
  * the stages that can go quadratic: shingle-df distribution around
  * the cap, candidate pairs out of the inverted index, verified
  * output pairs — per volume factor, on the exact bench corpus
  * (docs + 12-word excerpts, k=3, maxShingleDf=20).
  *
  * Usage: runMain graft.tools.ContainmentProbe [workDir] [factors]
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val factors = args.lift(1).getOrElse("1,8,32")
      .split(',').map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    factors.foreach { f =>
      val docs = graft.core.Tables.documents(spark, s"$work/x$f")
      // excerpt ids offset past max(doc_id), never a fixed constant —
      // a corpus with ids >= the constant would silently alias
      // excerpts onto real docs and skew every count below
      val off = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.select((col("doc_id") + off).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 12), ' ')").as("text")))
      val sh = corpus.select(col("doc_id"),
        graft.functions.Hashes.gram_md5_mod31(col("text"), 3).as("hs"))
      val df = sh.select(explode(col("hs")).as("h"))
        .groupBy("h").count()
      val prof = df.agg(
        count(lit(1)).as("shingles"),
        sum(when(col("count") > 20, 1)).as("over_cap"),
        sum(when(col("count").between(2, 20),
          (col("count") * (col("count") - 1) / 2).cast("long")))
          .as("raw_pairs_under_cap"))
        .first()
      val nDocs = corpus.count()
      val t0 = System.nanoTime()
      val verified = graft.dedup.Dedup.containmentPairs(
        corpus, 3, 0.9, maxShingleDf = 20).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CONTPROBE x$f docs=$nDocs shingles=${prof.getLong(0)} " +
        f"overCap=${prof.getLong(1)} rawPairsUnderCap=${prof.getLong(2)} " +
        f"verified=$verified wall=$sec%.1f")
      Console.out.flush()
    }
    spark.stop()
  }
}
