package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev tool: empirical scale soak — run headline queries at 1×/2×/4×/8×
  * the sf0.1 data volume and report how wall time scales.
  *
  * A plan that is scale-sane on a fixed-core box should grow ~linearly
  * in fact-table volume (scans, partial aggs, broadcast joins, banded
  * LSH); anything super-linear flags an operator whose intermediate
  * grows faster than its input — the local proxy for "dies at 100 TB".
  *
  * Scaling model mirrors warehouse reality: FACT tables replicate with
  * disjoint key ranges (orders/lineitem keep their FK relationship;
  * events keep user ids so per-key history deepens; documents get a
  * per-copy suffix so text stays unique; embeddings get a per-copy
  * additive shift so only injected duplicates are near-dups — pair
  * counts stay linear); DIMENSIONS stay fixed.
  *
  * Usage: sbt "runMain graft.tools.ScaleSoak [baseSfDir] [workDir] [outMd]"
  */
object ScaleSoak {

  private val Off = 10000000L
  private def factors = sys.env.getOrElse("SPARK_GRAFT_SOAK_FACTORS", "1,2,4,8")
    .split(',').map(_.trim.toInt).toSeq
  private def runs = sys.env.getOrElse("SPARK_GRAFT_SOAK_RUNS", "3").toInt
  private val queries = Seq(
    "q1_agg", "q_multi_join", "q_topk", "q_time_bucket_agg",
    "q_asof_join_merge", "d_dedup_exact", "d_dedup_minhash_pairs",
    "d_cosine_topk", "d_dedup_embed_lsh", "q_events_sessionize")

  private def buildScaled(spark: SparkSession, base: String, dir: String,
                          factor: Int): Unit = {
    if (Files.exists(Paths.get(dir, "lineitem.parquet"))) return
    Files.createDirectories(Paths.get(dir))
    // dims: fixed
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    def copies(t: String)(shift: (DataFrame, Long) => DataFrame): Unit =
      (0 until factor).map { k =>
        shift(spark.read.parquet(s"$base/$t.parquet"), Off * k)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    copies("orders")((df, o) =>
      df.withColumn("o_orderkey", col("o_orderkey") + o))
    copies("lineitem")((df, o) =>
      df.withColumn("l_orderkey", col("l_orderkey") + o))
    copies("events")((df, o) => // ts stays INT64 nanos; tie-break id offset
      df.withColumn("event_id", col("event_id") + o))
    copies("documents")((df, o) =>
      df.withColumn("doc_id", col("doc_id") + o)
        .withColumn("text", concat(col("text"), lit(s" uniq$o"))))
    copies("embeddings") { (df, o) =>
      // geometry-preserving decorrelation: circular-rotate components
      // by the copy index. Within a copy all cosines are unchanged
      // (injected dups stay exact); ACROSS copies rotated vectors are
      // as uncorrelated as random ones — an additive shift instead
      // would align every copy with the all-ones direction and create
      // quadratically many true near-dup pairs (measured: 6s at 2×,
      // 80s at 4× — the output itself goes quadratic, not the plan).
      val k = (o / Off).toInt % 64
      df.withColumn("vec_id", col("vec_id") + o)
        .withColumn("embedding", expr(
          s"transform(sequence(0, 63), i -> element_at(embedding, CAST((i + $k) % 64 AS INT) + 1))"))
    }
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_scale")
    val outMd = args.lift(2).getOrElse("SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    factors.foreach(f => buildScaled(spark, base, s"$work/x$f", f))
    // warmup
    try SparkEntry.queries("q1_agg")(spark, s"$work/x1").count()
    catch { case _: Throwable => () }

    val times: Map[(String, Int), Double] = (for {
      f <- factors
      q <- queries
    } yield {
      val t = median((1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(q)(spark, s"$work/x$f").count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      })
      println(f"SOAK x$f $q%-24s $t%7.2fs")
      Console.out.flush()
      (q, f) -> t
    }).toMap

    val sb = new StringBuilder
    val fs = factors
    val ratio = fs.last.toDouble / fs.head
    sb.append("# SCALE soak — wall time vs data volume\n\n")
    sb.append(s"Fact tables replicated ${fs.mkString("×/")}× from `$base` (disjoint key\n")
    sb.append("ranges, fixed dims, per-copy-perturbed embeddings); per-query\n")
    sb.append(s"median of $runs on local[" + cpus + s"]. A time ratio near the $ratio×\n")
    sb.append("volume ratio = linear in input (scale-sane); well above = a\n")
    sb.append("super-linear intermediate. Sub-linear = fixed per-query overhead\n")
    sb.append("still dominates at this size.\n\n")
    sb.append("| query |" + fs.map(f => s" ${f}x (s) |").mkString + " ratio |\n")
    sb.append("|---|" + fs.map(_ => "---|").mkString + "---|\n")
    queries.foreach { q =>
      val r = fs.map(f => times((q, f)))
      sb.append("| " + q + " |" + r.map(t => f" $t%.2f |").mkString +
        f" ${r.last / r.head}%.1f |\n")
    }
    Files.write(Paths.get(outMd), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $outMd")
    spark.stop()
  }
}
