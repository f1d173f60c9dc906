package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (IvfProbe convention): stage-level timing of the
  * m_audio_dedup pipeline on a scaled corpus — separates the linear
  * decode/fingerprint cost from the band-bucket candidate volume, so
  * a super-linear soak ratio can be attributed to the right stage.
  *
  * Usage: runMain graft.tools.AudioDedupProbe [sfDir]
  */
object AudioDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x8")
    val spark = graft.GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the entry's mediaIds fix: the skinny scan coalesces to a few
    // partitions, so the decode fan-out must be re-spread explicitly
    def media = docs.select("doc_id")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].flatMap { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = (0 until 32).flatMap(blk =>
        md.digest(s"$id:$blk".getBytes("UTF-8")).map(_ & 0xff).toSeq)
      Seq(
        graft.mm.Multimodal.MediaRow(id, "audio",
          graft.mm.Multimodal.pcmWavU8(base), 0, 0, 0),
        graft.mm.Multimodal.MediaRow(id + 10000, "audio",
          graft.mm.Multimodal.pcmWavU8(base.map(u => u * 9 / 10)), 0, 0, 0))
    }
    var t0 = System.nanoTime()
    for (r <- 1 to 3) {
      t0 = System.nanoTime()
      val nf = graft.mm.Multimodal.audioFingerprint(media).toDF().count()
      println(f"fingerprint-only run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s, $nf fps")
    }
    t0 = System.nanoTime()
    val fps = graft.mm.Multimodal.audioFingerprint(media).toDF()
      .localCheckpoint()
    val nf = fps.count()
    println(f"fingerprint+ckpt: ${(System.nanoTime() - t0) / 1e9}%.2f s, $nf fps")
    t0 = System.nanoTime()
    val pairsFromFps = graft.mm.Multimodal.audioNearDupsDelta(
      fps.limit(0), fps, maxHamming = 3)
    println(f"pairs (from checkpointed fps): ${pairsFromFps.count()} " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (r <- 1 to 3) {
      t0 = System.nanoTime()
      val full = graft.mm.Multimodal.audioNearDups(media, maxHamming = 3)
      println(f"full audioNearDups run $r: ${full.count()} " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t0 = System.nanoTime()
    // the production meltAudioBands scheme at maxHamming=3: 4 bands
    // of 8 hex chars (32 bits) covering the full 128-bit fingerprint
    // — 16-bit slices would inflate birthday collisions and
    // misattribute candidate volume
    val melted = fps.select(col("doc_id"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band_idx"),
        substring(col("fp"), i * 8 + 1, 8).as("band"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band"))
    val cand = melted.as("a").join(melted.as("b"), Seq("band_idx", "band"))
      .filter(col("a.doc_id") < col("b.doc_id")).count()
    println(f"raw band candidates: $cand in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
