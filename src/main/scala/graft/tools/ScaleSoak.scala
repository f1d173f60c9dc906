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
  /** Comma-separated query-name filter for bisecting a single outlier
    * (same contract as SPARK_GRAFT_BENCH_ONLY). Non-full runs skip the
    * cache/minhash sections and write nothing unless outMd is given
    * explicitly — a bisection must never clobber the committed table.
    */
  private def only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_SOAK_ONLY").map(_.split(',').map(_.trim).toSet)
  private val queries = Seq(
    "q1_agg", "q_multi_join", "q_topk", "q_time_bucket_agg",
    "q_asof_join_merge", "d_dedup_exact", "d_dedup_minhash_pairs",
    "d_cosine_topk", "d_dedup_embed_lsh", "q_events_sessionize",
    "d_decontaminate", "d_unigram_logprob", "d_pack_sequences",
    "d_dedup_lines", "d_c4_clean",
    "q_lttb_downsample", "d_heavy_hitters", "d_tfidf_keywords",
    "q_range_join", "d_dedup_spans", "d_semdedup",
    "q_sync_reconcile", "q_grouping_sets", "d_chunk_docs",
    "d_bm25_search", "d_blocklist_filter", "d_dedup_minhash_delta",
    "q_time_fill", "q_funnel", "q_retention", "d_winnowing_pairs",
    "d_char_entropy", "d_bigram_logprob", "d_gopher_rules",
    "d_dsir_select", "d_quality_classifier", "d_domain_overlap",
    "d_dedup_keep_best", "d_decontaminate_semantic", "d_embed_outliers",
    "d_hybrid_search", "d_shard_report", "q_shipping_priority",
    "q_returned_revenue", "d_length_histogram",
    "d_html_extract", "d_warc_roundtrip", "d_url_filter",
    "d_url_dedup", "d_ccnet_buckets", "d_crawl_pipeline",
    "d_compression_ratio", "d_crawl_charset", "d_url_psl",
    "d_robots_filter", "d_url_percent", "d_link_graph", "d_domain_rank",
    "d_anchor_text", "d_crawl_gates", "d_harmonic", "d_crawl_frontier",
    "d_crawl_diff", "d_sitemap", "d_fetch_schedule", "d_hits",
    "d_link_components", "d_token_budget", "d_embed_pca",
    "d_curriculum", "d_shot_detect", "d_vad_segments",
    "d_split_assign", "d_split_leakage", "m_image_dhash", "m_image_dedup",
    "d_dedup_minhash_portable", "d_script_detect", "d_unicode_normalize",
    "d_audio_clipping", "m_image_dedup_delta", "m_video_dedup",
    "d_sentences", "d_embed_truncate", "q_sync_evolve",
    "q_sync_deletes", "q_scd2_history", "d_weighted_sample",
    "d_recrawl_rate", "d_markdown_strip", "d_bpe_encode",
    "q_cdc_apply", "q_time_weighted_avg", "d_fetch_delay",
    "d_bpe_fertility", "q_event_transitions", "q_scd2_delta",
    "q_json_extract", "d_dedup_containment", "q_anomaly_zscore",
    "q_data_quality", "d_license_detect", "d_code_detect",
    "q_funnel_windowed", "d_domain_rank_dangling", "d_domain_rank_seeded",
    "d_kneser_ney", "d_graph_stats", "d_warc_split_read",
    "d_kneser_ney3", "d_crawl_frontier_ranked", "d_scc", "d_graph_bowtie",
    "m_audio_dedup", "m_audio_dedup_delta", "d_unigram_tok_train",
    "d_unigram_encode", "d_unigram_sample",
    "d_wordpiece_encode", "d_wordpiece_pairs", "d_pq_encode",
    "d_lang_id_learned",
    "d_bpe_encode_bytes", "d_ann_filtered", "d_ann_pq_filtered")

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
    copies("documents") { (df, o) =>
      // decorrelate copies TEXTUALLY, not just by a trailing token: tag
      // every word with the copy index so cross-copy shingle sets are
      // disjoint. A trailing "uniq" suffix leaves copies of one base
      // doc ~identical under 3-shingle Jaccard — every base doc becomes
      // a 2·factor-clique and the near-dup pair OUTPUT grows Θ(f²) by
      // definition (measured: 6k/34k/154k/654k candidates at 1/2/4/8×,
      // >99.99% verifying as TRUE pairs — output-bound, not hot
      // buckets). Within a copy the query-time mutation still yields
      // one injected near-dup per doc, so true pairs grow linearly.
      val k = o / Off
      df.withColumn("doc_id", col("doc_id") + o)
        .withColumn("text", array_join(
          expr(s"transform(split(text, ' '), w -> concat(w, '_$k'))"), " "))
    }
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

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Incremental-cache soak: initial load of the oldest ~99% of events
    * vs a refresh that pulls only the newest ~1% tail past the
    * watermark (reference enhanced_query_service.py:305). With the
    * slice-append provider the refresh writes O(tail); its curve must
    * track the TAIL as volume grows, not the cached total.
    */
  private def cacheSoakSection(spark: SparkSession, work: String): String = {
    import graft.cache._
    val rows = factors.map { f =>
      val headDir = s"$work/cachehead_x$f"
      // normalize ts to INT64 micros once (testdata generations have
      // shipped both TIMESTAMP(NANOS) — LongType under nanosAsLong —
      // and TIMESTAMP(MICROS)); head and full MUST agree on the
      // watermark column's type, so both read the normalized copy
      val full = s"$work/cachefull_x$f"
      if (!Files.exists(Paths.get(full, "events.parquet"))) {
        Files.createDirectories(Paths.get(full))
        val rawIn = spark.read.parquet(s"$work/x$f/events.parquet")
        val asLong = rawIn.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            rawIn.withColumn("ts", expr("ts div 1000"))
          case _ =>
            rawIn.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
        }
        asLong.write.mode("overwrite").parquet(s"$full/events.parquet")
      }
      val raw = spark.read.parquet(s"$full/events.parquet")
      if (!Files.exists(Paths.get(headDir, "events.parquet"))) {
        Files.createDirectories(Paths.get(headDir))
        val Array(b) = raw.stat.approxQuantile("ts", Array(0.99), 1e-4)
        raw.filter(col("ts") <= lit(b.toLong))
          .write.mode("overwrite").parquet(s"$headDir/events.parquet")
      }
      val mgr = new QueryCacheManager(
        new ParquetCacheProvider(spark, s"$work/cachestore_x$f"))
      mgr.clearCache()
      val headRows = spark.read.parquet(s"$headDir/events.parquet").count()
      val (r1, tInit) = timed(new CachedQueryService(spark, headDir, mgr)
        .queryWithCaching("events", limit = headRows.toInt, timeCol = Some("ts"),
          selectedConversions = Some(Map.empty)))
      val (r2, tRefresh) = timed(new CachedQueryService(spark, full, mgr)
        .queryWithCaching("events", timeCol = Some("ts"),
          selectedConversions = Some(Map.empty)))
      require(r2.isIncremental && r2.newRows > 0, "refresh must be an incremental pull")
      println(f"CACHESOAK x$f init=${tInit}%.2fs (${r1.rowCount} rows) " +
        f"refresh=${tRefresh}%.2fs (${r2.newRows} new)")
      Console.out.flush()
      f"| ${f}x | ${r1.rowCount} | $tInit%.2f | ${r2.newRows} | $tRefresh%.2f |\n"
    }
    "\n## Incremental cache: initial load vs 1%-tail refresh\n\n" +
      "Parquet-backed `CachedQueryService` on the scaled `events` table:\n" +
      "initial load caches the oldest ~99% of rows; the refresh pulls only\n" +
      "rows past the stored watermark and slice-APPENDS them (O(tail)\n" +
      "write). Scale-sane = the initial column grows with volume while the\n" +
      "refresh column tracks the 1% tail.\n\n" +
      "| factor | cached rows | initial (s) | tail rows | refresh (s) |\n" +
      "|---|---|---|---|---|\n" + rows.mkString
  }

  /** MinHash LSH candidate profile: is d_dedup_minhash_pairs' soak
    * curve candidate-bound (hot buckets exploding super-linearly) or
    * output-bound (candidates track the injected near-dups)? Counts
    * band-bucket occupancy and candidate pairs at each volume step,
    * using the exact bench corpus/params (k=3, 32 perms, 8 bands).
    */
  private def minhashProfileSection(spark: SparkSession, work: String): String = {
    import graft.dedup.Dedup
    val rows = factors.map { f =>
      val docs = graft.core.Tables.documents(spark, s"$work/x$f")
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
      val corpus = docs.select("doc_id", "text").unionByName(mutated)
      val nDocs = corpus.count()
      val sh = corpus.select(col("doc_id"),
        graft.functions.Hashes.gram_hashes(col("text"), 3).as("hs"))
      val withSig = sh.withColumn("sig",
        graft.functions.Hashes.minhash_sig(col("hs"), 32))
      val buckets = Dedup.lshBuckets(withSig, 32, 8)
      val occ = buckets.groupBy("band_id", "band_hash").count()
        .filter(col("count") > 1)
        .agg(count(lit(1)).as("hot"),
          coalesce(max("count"), lit(0L)).as("mx"),
          coalesce(sum(expr("count * (count - 1) / 2")), lit(0.0)).as("raw"))
        .head()
      val (hot, mx, raw) = (occ.getLong(0), occ.getLong(1), occ.getDouble(2).toLong)
      val a = buckets.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
      val b = buckets.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
      val cand = a.join(b, Seq("band_id", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
      val verified = Dedup.minhashNearDups(corpus, 3, 32, 8, 0.5).count()
      println(s"MINHASHPROF x$f docs=$nDocs hot=$hot max=$mx raw=$raw " +
        s"cand=$cand verified=$verified")
      Console.out.flush()
      s"| ${f}x | $nDocs | $hot | $mx | $raw | $cand | $verified |\n"
    }
    "\n## MinHash LSH candidate profile (d_dedup_minhash_pairs corpus)\n\n" +
      "Band-bucket occupancy at each volume step, same corpus and params\n" +
      "as the bench query (k=3 shingles, 32 perms, 8 bands, one injected\n" +
      "near-dup per doc). `raw cand` = Σ c·(c−1)/2 over buckets with c>1\n" +
      "(pairs entering the candidate join before distinct); candidate and\n" +
      "verified counts growing ~linearly with docs = output-bound\n" +
      "(scale-sane); a super-linear `raw cand` column = hot buckets.\n\n" +
      "| factor | docs | buckets c>1 | max bucket | raw cand | distinct cand | verified |\n" +
      "|---|---|---|---|---|---|---|\n" + rows.mkString
  }

  // ---- graph-sized soak (SPARK_GRAFT_SOAK_GRAPH=only to run just this
  // section): the corpus-volume soak above replicates DOCUMENTS, so the
  // LinkGraph family keeps seeing the ~21-node bench graph and its
  // "8x ratios" of 0.8-0.9x measure nothing but fixed per-stage
  // overhead. This axis scales the GRAPH: synthetic power-law digraphs
  // at 1e4/1e5/1e6 nodes (SPARK_GRAFT_GRAPH_NODES), fixed avg
  // out-degree 8 — so SCC's peeling depth, bow-tie's reachability
  // passes, and the iterative centralities are finally measured on
  // graph-shaped growth, not corpus-shaped.

  private def graphSizes = sys.env
    .getOrElse("SPARK_GRAFT_GRAPH_NODES", "10000,100000,1000000")
    .split(',').map(_.trim.toLong).toSeq
  private def graphRuns = sys.env.getOrElse("SPARK_GRAFT_SOAK_GRAPH_RUNS", "1").toInt

  /** Deterministic Chung-Lu power-law digraph: m = n·avgDeg candidate
    * edges whose endpoints are drawn with P(node i) ∝ i^(−a),
    * a = 1/(γ−1) with γ = 2.2 (the web-graph degree exponent), via
    * inverse-CDF over xxhash64-derived uniforms — id = ⌈n·u^(1/(1−a))⌉.
    * Expected max degree ~ m/(6·n^(1/6)) (a real hub), ~90 % of ids
    * appear, a giant SCC emerges at this density. Fully deterministic
    * (hash-derived), self-loops dropped here, parallel edges left for
    * the operators' own `distinct` (they all collapse them).
    */
  private[tools] def powerLawGraph(spark: SparkSession, n: Long,
                                   avgDeg: Int = 8): DataFrame = {
    val a = 1.0 / (2.2 - 1.0)
    val q = 1.0 / (1.0 - a)
    def pick(seed: Int) =
      s"greatest(1L, least(${n}L, CAST(ceil($n * pow(" +
        s"(xxhash64(id, $seed) & 9223372036854775807) / 9.223372036854776e18," +
        s" $q)) AS LONG)))"
    spark.range(n * avgDeg)
      .selectExpr(s"${pick(1)} AS src", s"${pick(2)} AS dst")
      .filter(col("src") =!= col("dst"))
  }

  private def graphSoakSection(spark: SparkSession): String = {
    import graft.ops.LinkGraph
    val sizes = graphSizes
    val structRows = new StringBuilder
    val opNames = Seq("pagerank", "pagerank_dangling", "pagerank_seeded",
      "hits", "harmonic_hll", "components", "scc", "bowtie")
    val times = scala.collection.mutable.Map[(String, Long), Double]()
    // per-run wall + attribution counters (the Bench spread-block
    // treatment): a drifted median self-attributes instead of needing
    // a re-run — see JvmCounters
    val detail = scala.collection.mutable
      .Map[(String, Long), Seq[(Double, JvmCounters.Snap)]]()
    // Untimed warm-up over every operator on a small graph: the first
    // timed size otherwise absorbs all JIT/codegen warm-up (measured:
    // pagerank 16.0 s at n=1e4 vs 8.6 s at n=1e5 on a cold JVM) and
    // the node-scaling ratios read upside down.
    locally {
      val w = powerLawGraph(spark, 2000L).localCheckpoint()
      val wSeeds = spark.range(1, 17).select(col("id").as("n"))
      LinkGraph.pageRank(w).count()
      LinkGraph.pageRank(w, redistributeDangling = true).count()
      LinkGraph.pageRank(w, seeds = Some(wSeeds), probeEvery = 5).count()
      LinkGraph.hits(w).count()
      LinkGraph.harmonicCentrality(w, exact = false, lgK = 9).count()
      LinkGraph.components(w).count()
      LinkGraph.stronglyConnectedComponents(w).count()
      LinkGraph.bowTie(w).count(): Unit
    }
    sizes.foreach { n =>
      val e = powerLawGraph(spark, n).localCheckpoint()
      val nEdges = e.distinct().count()
      val nNodes = e.select(col("src").as("n"))
        .unionByName(e.select(col("dst").as("n"))).distinct().count()
      // untimed PER-SIZE warm-up: the n=2000 JVM warm-up above does
      // not warm this size's plan shapes (AQE stats, shuffle sizing,
      // codegen for the size-specific adaptive plans), so the first
      // TIMED op at each size otherwise absorbs the transition — the
      // r16 pre-fix table read pagerank's 1e6 run1 at 58 s (jit 5.7 s,
      // 16 codegen compiles) vs 12.5 s steady state
      LinkGraph.pageRank(e).count()
      def t(name: String)(body: => DataFrame): Unit = {
        val rs = (1 to graphRuns).map { _ =>
          val before = JvmCounters.snap()
          val (_, sec) = timed(body.count())
          (sec, JvmCounters.delta(before, JvmCounters.snap()))
        }
        val sec = median(rs.map(_._1))
        times((name, n)) = sec
        detail((name, n)) = rs
        val runsStr = rs.map(r => f"${r._1}%.2f").mkString("/")
        println(f"GRAPHSOAK n=$n%-8d $name%-18s $sec%8.2fs  runs=$runsStr")
        Console.out.flush()
      }
      // a fixed small seed set (ids 1-16 are the heavy hubs by
      // construction, so the personalized ranks actually spread)
      val seeds = spark.range(1, 17).select(col("id").as("n"))
      t("pagerank")(LinkGraph.pageRank(e))
      t("pagerank_dangling")(LinkGraph.pageRank(e, redistributeDangling = true))
      t("pagerank_seeded")(LinkGraph.pageRank(e, seeds = Some(seeds),
        probeEvery = 5))
      t("hits")(LinkGraph.hits(e))
      // lgK 9 (~0.5 KB/sketch): 1e6-node state stays sub-GB per round;
      // exact id-array balls would be reach-sized — the documented
      // non-scale path, deliberately not soaked at 1e6
      t("harmonic_hll")(LinkGraph.harmonicCentrality(e, exact = false, lgK = 9))
      t("components")(LinkGraph.components(e))
      var sccRounds = 0
      var giantPct = 0.0
      t("scc") {
        val (scc, r) = LinkGraph.sccWithRounds(e)
        sccRounds = r
        val g = scc.groupBy("scc").count()
          .agg(coalesce(max("count"), lit(0L))).first().getLong(0)
        giantPct = 100.0 * g / math.max(nNodes, 1L)
        scc
      }
      t("bowtie")(LinkGraph.bowTie(e))
      structRows.append(f"| ${n}%d | $nNodes | $nEdges | $giantPct%.1f%% " +
        f"| $sccRounds |\n")
    }
    val ratio = sizes.last.toDouble / sizes.head
    val sb = new StringBuilder
    sb.append("\n## Graph-sized soak: LinkGraph family vs node count\n\n")
    sb.append("Synthetic Chung-Lu power-law digraphs (degree exponent 2.2, avg\n")
    sb.append(s"out-degree 8, hash-deterministic), per-op median of $graphRuns,\n")
    sb.append(f"driver heap ${Runtime.getRuntime.maxMemory / (1L << 30)}%d GiB " +
      "(run with SPARK_DRIVER_MEM >= 32g: at 8g the 1e6 axis\n" +
      "measures GC churn on accumulated checkpoint blocks, not the\n" +
      "operators — the r15 20-130 s pagerank band was exactly this).\n")
    sb.append("Edges grow linearly with nodes, so a time ratio near the\n")
    sb.append(f"$ratio%.0fx node ratio = linear (scale-sane); well above = a\n")
    sb.append("super-linear intermediate or round blow-up. The corpus soak\n")
    sb.append("never exercised these operators beyond the ~21-node bench graph.\n\n")
    sb.append("| nodes (target) | nodes (actual) | distinct edges | giant SCC | scc outer rounds |\n")
    sb.append("|---|---|---|---|---|\n")
    sb.append(structRows)
    sb.append("\n| operator |" + sizes.map(n => s" n=$n (s) |").mkString + " ratio |\n")
    sb.append("|---|" + sizes.map(_ => "---|").mkString + "---|\n")
    opNames.foreach { op =>
      val r = sizes.map(n => times((op, n)))
      sb.append("| " + op + " |" + r.map(t => f" $t%.2f |").mkString +
        f" ${r.last / r.head}%.1f |\n")
    }
    // per-row attribution detail: every (op, size) row carries its
    // individual run walls plus the gc/jit/cpu/codegen deltas, so an
    // outlier median is adjudicable from the artifact alone (wall up
    // with cpu tracking wall, gc/jit flat = external contention;
    // codegen > 0 on a warm run = generated-class-cache miss)
    sb.append("\nPer-run detail (wall s | gc ms | jit ms | cpu s | codegen compiles):\n\n")
    sb.append("| operator | nodes | runs (s) | gc_ms | jit_ms | cpu_sec | codegen |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    opNames.foreach { op =>
      sizes.foreach { n =>
        val rs = detail((op, n))
        def fmt[A](f: ((Double, JvmCounters.Snap)) => A) =
          rs.map(r => f(r).toString).mkString("/")
        sb.append(s"| $op | $n | " +
          rs.map(r => f"${r._1}%.2f").mkString("/") + " | " +
          fmt(_._2.gcMs) + " | " + fmt(_._2.jitMs) + " | " +
          fmt(r => f"${r._2.cpuSec}%.1f") + " | " +
          fmt(_._2.codegenCompiles) + " |\n")
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_scale")
    // parsed before the output path: a contended run must never default
    // onto the canonical quiet SCALE.md (the BENCH_CONTENDED.json split,
    // mirrored — ADVICE r14). An explicit 3rd arg still wins.
    val contend = sys.env.get("SPARK_GRAFT_SOAK_CONTEND")
      .map(_.trim.toInt).getOrElse(0)
    require(contend >= 0, s"SPARK_GRAFT_SOAK_CONTEND must be >= 0, got $contend")
    val outMd = args.lift(2).getOrElse(
      if (contend > 0) "SCALE_CONTENDED.md" else "SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // perf confs (codegen-class cache, footer-stat pushdown) come from
    // the GraftSession library surface — one source of truth with Bench
    val spark = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_SOAK_GRAPH=only: run just the graph-sized axis (no
    // corpus scaling, no churn) and write to its own file so a
    // targeted run can never clobber the committed corpus table
    if (sys.env.get("SPARK_GRAFT_SOAK_GRAPH").contains("only")) {
      val gOut = args.lift(2).getOrElse("SCALE_GRAPH.md")
      val s = "# SCALE soak — graph axis (standalone run)\n" +
        graphSoakSection(spark)
      Files.write(Paths.get(gOut), s.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $gOut")
      spark.stop()
      return
    }

    factors.foreach(f => buildScaled(spark, base, s"$work/x$f", f))
    // warmup
    try SparkEntry.queries("q1_agg")(spark, s"$work/x1").count()
    catch { case _: Throwable => () }

    // SPARK_GRAFT_SOAK_CONTEND=N (parsed above): Bench's churn threads
    // for the whole timed section — probes volume x contention
    // interactions (an operator can be flat at 8x quiet AND flat at 1x
    // contended yet blow up when both pressures stack). 0 = quiet.
    @volatile var stopLoad = false
    val loadSink = new java.util.concurrent.atomic.AtomicLong
    val loadThreads = (0 until contend).map { i =>
      val t = new Thread(() => {
        val rnd = new java.util.Random(i)
        while (!stopLoad) {
          val arr = new Array[Long](1 << 20)
          var j = 0
          while (j < arr.length) {
            arr(j) = rnd.nextLong() ^ (arr((j * 31) % arr.length) * 0x9E3779B97F4A7C15L)
            j += 1
          }
          loadSink.addAndGet(arr(rnd.nextInt(arr.length)))
        }
      })
      t.setDaemon(true)
      t.setName(s"graft-soak-contend-$i")
      t.start()
      t
    }

    val selected = only.fold(queries)(s => queries.filter(s))
    // per-run wall + attribution counters (the graph-axis treatment):
    // every soak row self-attributes its spread from the artifact
    val soakDetail = scala.collection.mutable
      .Map[(String, Int), Seq[(Double, JvmCounters.Snap)]]()
    val times: Map[(String, Int), Double] = (for {
      f <- factors
      q <- selected
    } yield {
      val rs = (1 to runs).map { _ =>
        val before = JvmCounters.snap()
        val t0 = System.nanoTime()
        try SparkEntry.queries(q)(spark, s"$work/x$f").count()
        catch { case _: Throwable => () }
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, JvmCounters.delta(before, JvmCounters.snap()))
      }
      val t = median(rs.map(_._1))
      soakDetail((q, f)) = rs
      println(f"SOAK x$f $q%-24s $t%7.2fs  runs=" +
        rs.map(r => f"${r._1}%.2f").mkString("/"))
      Console.out.flush()
      (q, f) -> t
    }).toMap
    stopLoad = true
    loadThreads.foreach(_.join(2000))

    val sb = new StringBuilder
    val fs = factors
    val ratio = fs.last.toDouble / fs.head
    sb.append("# SCALE soak — wall time vs data volume\n\n")
    if (contend > 0)
      sb.append(s"**CONTENDED run: $contend churn threads active for the " +
        "whole timed section (not the canonical quiet table).**\n\n")
    sb.append(s"Fact tables replicated ${fs.mkString("×/")}× from `$base` (disjoint key\n")
    sb.append("ranges, fixed dims, per-copy-perturbed embeddings); per-query\n")
    sb.append(s"median of $runs on local[" + cpus + "], driver heap " +
      f"${Runtime.getRuntime.maxMemory / (1L << 30)}%d GiB.\n")
    sb.append(s"A time ratio near the $ratio×\n")
    sb.append("volume ratio = linear in input (scale-sane); well above = a\n")
    sb.append("super-linear intermediate. Sub-linear = fixed per-query overhead\n")
    sb.append("still dominates at this size.\n\n")
    sb.append("| query |" + fs.map(f => s" ${f}x (s) |").mkString + " ratio |\n")
    sb.append("|---|" + fs.map(_ => "---|").mkString + "---|\n")
    selected.foreach { q =>
      val r = fs.map(f => times((q, f)))
      sb.append("| " + q + " |" + r.map(t => f" $t%.2f |").mkString +
        f" ${r.last / r.head}%.1f |\n")
    }
    sb.append("\nPer-run detail (wall s | gc ms | jit ms | cpu s | codegen compiles):\n\n")
    sb.append("| query | factor | runs (s) | gc_ms | jit_ms | cpu_sec | codegen |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    selected.foreach { q =>
      fs.foreach { f =>
        val rs = soakDetail((q, f))
        def fmt[A](g: ((Double, JvmCounters.Snap)) => A) =
          rs.map(r => g(r).toString).mkString("/")
        sb.append(s"| $q | ${f}x | " +
          rs.map(r => f"${r._1}%.2f").mkString("/") + " | " +
          fmt(_._2.gcMs) + " | " + fmt(_._2.jitMs) + " | " +
          fmt(r => f"${r._2.cpuSec}%.1f") + " | " +
          fmt(_._2.codegenCompiles) + " |\n")
      }
    }
    sb.append("\nd_semdedup self-tunes nlist from the corpus count (nlist = 0 in the\n")
    sb.append("entry), so expected cluster membership — and the per-cluster\n")
    sb.append("quadratic pairwise term — stays flat as volume grows. Earlier\n")
    sb.append("rounds soaked the fixed-nlist knob and measured the compounding\n")
    sb.append("(6.7x wall at 8x volume); auto mode is the production contract.\n")
    if (only.isEmpty) {
      sb.append(cacheSoakSection(spark, work))
      sb.append(minhashProfileSection(spark, work))
      sb.append(graphSoakSection(spark))
    }
    if (only.isEmpty || args.length > 2) {
      Files.write(Paths.get(outMd), sb.toString.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $outMd")
    }
    spark.stop()
  }
}
