package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.Hashes
import graft.mm.Multimodal
import graft.ops.{TableStats, TimeBucketAgg, TypeInference}
import graft.queries.Analytics
import graft.sim.Similarity
import graft.sync.{PartitionedSync, SyncOps, TypeMapper}
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every entry in `queries` has a matching DuckDB `oracleSql` (same
  * column names, same deterministic ORDER BY, floats rounded
  * identically) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** The mixed code/prose corpus behind d_license_detect and
    * d_code_detect: every third doc rewrites into source-like lines
    * (`  let vI = "word";`) under a license header rotating by
    * doc_id % 4; the rest stay prose.
    */
  private[graft] def mixedCodeCorpus(docs: DataFrame): DataFrame = {
    val header =
      when(col("doc_id") % 4 === 0, lit("// SPDX-License-Identifier: MIT\n"))
        .when(col("doc_id") % 4 === 1,
          lit("// GNU GENERAL PUBLIC LICENSE Version 3\n"))
        .when(col("doc_id") % 4 === 2, lit(
          "// This is free and unencumbered software released into the public domain\n"))
        .otherwise(lit("// internal tool\n"))
    val codeBody = expr(
      """array_join(transform(split(text, ' '),
        |  (w, i) -> concat('  let v', i, ' = "', w, '";')), '\n')""".stripMargin)
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(header, codeBody))
        .otherwise(col("text")).as("text"))
  }

  /** d_bpe_encode's fixed merge table (rank order). Chained merges
    * (th+e</w>, an+d</w>) deliberately consume EARLIER outputs — the
    * in-order oracle replay stays equivalent to greedy inference
    * because chained outputs only ever feed later-ranked merges.
    */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "e" -> "</w>", "t" -> "h", "th" -> "e</w>", "d" -> "</w>",
    "i" -> "n", "a" -> "n", "o" -> "n", "e" -> "r", "an" -> "d</w>")

  /** d_bpe_encode_bytes' fixed BYTE-level merge table — [[bpeMerges]]
    * transposed into the uppercase-hex byte alphabet (65='e', 74='t',
    * 68='h', 64='d', 69='i', 61='a', 6E='n', 6F='o', 72='r'), same
    * chained-merge structure so the in-order oracle replay stays
    * equivalent to greedy inference.
    */
  private[graft] val bpeByteMerges: Seq[(String, String)] = Seq(
    "65" -> "</w>", "74" -> "68", "7468" -> "65</w>", "64" -> "</w>",
    "69" -> "6E", "61" -> "6E", "6F" -> "6E", "65" -> "72",
    "616E" -> "64</w>")

  /** doc ids spread over the session's full parallelism before a
    * decode-heavy synthetic-media flatMap. The documents table is a
    * few small parquet files, so the scan coalesces to 1-8 input
    * partitions — and a heavy decode flatMap INHERITS that layout and
    * runs nearly serial while the skinny scan itself is trivially
    * parallel (the r15 corpus soak read m_audio_dedup at ~15x wall
    * for 8x volume from exactly this: volume grew, decode
    * parallelism didn't). One cheap exchange of the id column buys
    * the decode stage the full core count; the general lesson is
    * that a fan-out stage's parallelism must be set by the WORK it
    * produces, not by the bytes it reads.
    */
  private def mediaIds(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism).as[Long]
  }

  /** d_unigram_encode's frozen model: integer costs as exactly-
    * representable log-probs (pieces −7, any single character −5 via
    * the unk fallback), so every Viterbi value is an exact integer in
    * double and the DuckDB oracle can replay the DP over reachable
    * (pos, cost, pieces) states. The piece set deliberately overlaps
    * ('and' vs 'an'+'d' vs 'a'+'nd'; 'the' vs 'te'/'he') so the
    * lattice carries genuine shortest-path decisions, not greedy
    * longest-match.
    */
  private[graft] val unigramFrozen: graft.text.Unigram.Model =
    graft.text.Unigram.Model(
      Seq("the", "and", "ing", "ion", "ent", "er", "in", "on", "at",
        "es", "en", "ed", "te", "al", "re", "st", "ar", "nd", "he",
        "an").map(_ -> -7.0).toMap,
      unkScore = -5.0)

  /** d_wordpiece_encode's frozen vocabulary: initial singles +
    * `##`-continuation singles for the corpus' characters, plus
    * multi-char pieces chosen so greedy longest-match makes genuine
    * decisions ("tab"+"##le" beats "ta"; "sp" rescues 'spark' from
    * the missing "##p"; "##dow" is dead because "wind" wins first).
    * `##p` is deliberately ABSENT so 'dup'/'group' exercise the
    * whole-word `[UNK]` rule.
    */
  /** d_pq_encode's frozen codebook: 4 subspaces x 4 centroids over
    * 16 dims each, components ((k + j + s) % 4 - 1.5) / 8 — exact
    * multiples of 1/16, so every dist = cnorm - 2*dot is an exact
    * IEEE double and the DuckDB oracle replays the argmin bit for
    * bit. K=4 keeps hex code pairs to digits (case-free compare).
    */
  private[graft] val pqFrozen: Array[Array[Array[Double]]] =
    Array.tabulate(4, 4, 16) { (s, k, j) => ((k + j + s) % 4 - 1.5) * 0.125 }

  /** d_pq_encode's frozen COARSE centroids (4 x 64 dims): exact
    * multiples of 1/16 like [[pqFrozen]], so the argmax-dot routing,
    * the residual subtraction, and the per-subspace argmin all replay
    * bit-for-bit in the DuckDB oracle (the IVFADC by-residual form).
    */
  private[graft] val pqCoarseFrozen: Array[Array[Double]] =
    Array.tabulate(4, 64) { (c, j) => (((c * 5 + j) % 7) - 3.0) * 0.0625 }

  private[graft] val wordpieceFrozen: Seq[String] =
    Seq("a", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "o",
      "p", "q", "r", "s", "t", "v", "w",
      "the", "ta", "tab", "sp", "val", "str", "wind") ++
    Seq("a", "b", "c", "d", "e", "g", "h", "i", "k", "l", "m", "n",
      "o", "r", "s", "t", "u", "w", "y",
      "le", "ine", "er", "ow", "ue", "eam", "dow").map("##" + _)

  /** Group (blob_id, doc_id, record-bytes) rows into multi-record WARC
    * blobs: byte layout deterministic (records sorted by id within a
    * blob), blob COUNT scales with the corpus (callers shard by
    * id / recordsPerBlob — bounded blob size, the way real crawl
    * archives shard), and each blob builds LINEARLY through one output
    * stream. (The previous fold of binary concat() was QUADRATIC in
    * blob size — the 8× soak measured d_crawl_pipeline at 9.9× before
    * this.)
    */
  private def warcBlobs(
      recs: org.apache.spark.sql.Dataset[(Long, Long, Array[Byte])]): org.apache.spark.sql.Dataset[Array[Byte]] = {
    val sp = recs.sparkSession
    import sp.implicits._
    recs.groupByKey(_._1).mapGroups { (_, it) =>
      val sorted = it.toArray.sortBy(_._2)
      val out = new java.io.ByteArrayOutputStream()
      sorted.foreach(r => out.write(r._3))
      out.toByteArray
    }
  }

  /** One-time-per-(JVM, corpus) on-disk WARC fixture for the
    * split-read query: ONE `.warc.gz` with one gzip member per doc
    * (the Common Crawl layout), written DISTRIBUTED through
    * [[graft.sources.Warc.write]] — no driver-side collect. Built
    * outside the timed path (the keep_best lesson: setup actions
    * inside a timed entry masquerade as query cost); member order is
    * whatever the writer partition produced, which the split reader
    * must not care about.
    */
  private val warcSplitFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def warcSplitFixture(s: SparkSession, d: String): String =
    warcSplitFixtureCache.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_warc_split_fx").toString
      val rows = Tables.documents(s, d).select(
        lit("resource").as("warc_type"),
        concat(lit("http://corpus.example/doc/"), col("doc_id"))
          .as("target_uri"),
        lit("text/plain").as("content_type"),
        col("text").cast("binary").as("payload"))
      graft.sources.Warc.write(rows.repartition(1), dir).count()
      dir
    })

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2a sync-engine surface -------------------------------------
    "q_full_sync" -> ((s, d) =>
      SyncOps.fullSnapshot(Tables.orders(s, d), Seq("o_orderkey"))),
    "q_incremental_sync" -> ((s, d) =>
      SyncOps.incremental(Tables.events(s, d), "ts", "2024-01-20 00:00:00",
        Seq("event_id"))),
    "q_upsert_keep_latest" -> ((s, d) =>
      SyncOps.upsertKeepLatest(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
        .select(eventCols.map(col): _*).orderBy("user_id")),
    "q_dedup_keys" -> ((s, d) =>
      SyncOps.dedupKeepLast(Tables.events(s, d), Seq("user_id", "event_type"),
        "ts", "event_id")
        .select(eventCols.map(col): _*).orderBy("user_id", "event_type")),
    "q_merge_partitioned" -> ((s, d) => {
      // year-partitioned sync target (PartitionedSync): orders before
      // 2000 full-sync; the tail (>= 2000) plus UPDATED versions of
      // some pre-1996 keys (o_orderkey % 97 == 0, bumped to 2002)
      // merge incrementally — only partitions receiving fresh rows
      // (2000/2001/2002) or holding stale versions (1995) rewrite;
      // 1996-1999 stay byte-identical on disk.
      val orders = Tables.orders(s, d)
      val bucket = date_format(col("o_orderdate"), "yyyy")
      val base = orders.filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      val updates = base
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp") &&
          col("o_orderkey") % 97 === 0)
        .withColumn("o_orderdate", lit("2002-01-01 00:00:00").cast("timestamp"))
        .withColumn("o_orderpriority", lit("UPDATED"))
      val fresh = orders
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .unionByName(updates)
      // applicationId in the path: two concurrent harness processes on
      // the same dataset must not overwrite each other's staged target
      // mid-read (same contract as the d_jsonl_roundtrip staging dir).
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pmerge_" +
        s"${s.sparkContext.applicationId}_${d.hashCode.toHexString}"
      PartitionedSync.writeFull(base, bucket, path)
      PartitionedSync.mergeIncremental(s, path, fresh,
        Seq("o_orderkey"), "o_orderdate", "o_orderkey", bucket)
      PartitionedSync.read(s, path).orderBy("o_orderkey")
    }),
    "q_sync_reconcile" -> ((s, d) => {
      // source/target divergence report: target drops keys %31==0,
      // rewrites priority for %37==0, and gains alien keys (+5000000)
      val orders = Tables.orders(s, d)
      val cmp = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
      val target = orders.filter(col("o_orderkey") % 31 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 37 === 0, lit("DRIFTED"))
            .otherwise(col("o_orderpriority")))
        .unionByName(orders.filter(col("o_orderkey") % 41 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 5000000))
      SyncOps.reconcile(orders, target, Seq("o_orderkey"), cmp)
    }),
    "q_merge_incremental" -> ((s, d) => {
      val ev = Tables.events(s, d)
      SyncOps.mergeSlices(
        ev.filter(col("ts") < lit("2024-01-25 00:00:00").cast("timestamp")),
        ev.filter(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp")),
        "ts", Seq("event_id"))
    }),
    "q_time_bucket_agg" -> ((s, d) =>
      TimeBucketAgg.bucketed(Tables.events(s, d), "ts", "10 minutes", Seq("value"))),
    "q_time_bucket_strptime" -> ((s, d) =>
      TimeBucketAgg.bucketedFromVarchar(
        Tables.events(s, d)
          .withColumn("ts_str", date_format(col("ts"), "yyyyMMddHHmmss")),
        "ts_str", "1 hour", Seq("value"))),
    "q_data_quality" -> ((s, d) => {
      // the post-load validation report: five row assertions (two
      // designed to fail on real data) + two uniqueness rules, all
      // in ONE aggregate pass
      graft.ops.QualityRules.check(Tables.orders(s, d),
        rowRules = Seq(
          "orderkey_not_null" -> col("o_orderkey").isNotNull,
          "price_positive" -> (col("o_totalprice") > 0),
          "price_above_1000" -> (col("o_totalprice") > 1000),
          "status_accepted" -> col("o_orderstatus").isin("O", "F", "P"),
          "date_in_range" -> col("o_orderdate").between(
            lit("1992-01-01 00:00:00").cast("timestamp"),
            lit("1998-12-31 23:59:59").cast("timestamp"))),
        uniqueRules = Seq(
          "orderkey_unique" -> Seq("o_orderkey"),
          "custkey_unique" -> Seq("o_custkey")))
    }),
    "q_json_extract" -> ((s, d) => {
      // typed fields out of the JSON property bag: $.k as BIGINT
      // (present everywhere), a missing path proving null-totality,
      // then the usual dashboard aggregate over the extraction
      val ev = graft.ops.JsonOps.flatten(Tables.events(s, d), "props",
        Seq(("k", "k", "BIGINT"), ("absent", "nope", "STRING")))
      ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
          count(col("absent")).as("n_absent_nonnull"))
        .orderBy("event_type")
    }),
    "q_time_weighted_avg" -> ((s, d) =>
      // LOCF time-weighted mean per user over the irregular event
      // series — plain AVG over-weights bursts; tieBreak = event_id
      TimeBucketAgg.timeWeightedAvg(Tables.events(s, d),
        "user_id", "ts", "value", "event_id").orderBy("user_id")),
    "q_time_fill" -> ((s, d) => {
      // sparse per-type hourly series (rare high-value events) made
      // chart-dense: missing hours appear with 0 count and the last
      // seen gauge value
      val b = Tables.events(s, d).filter(col("value") > 150)
        .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("value").cast("decimal(30,12)")).cast("double") /
            count(lit(1))).as("value_avg"))
        .withColumn("bucket_ts", col("w.start")).drop("w")
      TimeBucketAgg.fillTimeGaps(b, "bucket_ts", "1 hour",
        groupCols = Seq("event_type"), zeroFill = Seq("n_events"),
        forwardFill = Seq("value_avg"))
    }),
    "q_table_stats" -> ((s, d) =>
      TableStats.numericStats(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "q_row_counts" -> ((s, d) => TableStats.rowCounts(s, d, Tables.all)),
    "q_histogram" -> ((s, d) =>
      TableStats.histogram(Tables.lineitem(s, d), "l_extendedprice", 20)),
    "d_length_histogram" -> ((s, d) =>
      // doc-length (ws tokens) distribution — the signal that tunes
      // packing maxTokens, chunking stride, and min/max-length gates;
      // reuses the generic equal-width histogram operator
      TableStats.histogram(
        Tables.documents(s, d).select(
          size(split(trim(col("text")), "\\s+")).cast("long").as("tok")),
        "tok", 16)),
    "q_returned_revenue" -> ((s, d) => {
      // TPC-H Q10 shape: top-20 customers by revenue lost to returned
      // items in one quarter — selective fact filter (returnflag,
      // order-date window, both pushed) + dim joins + TakeOrdered
      val cut = lit("1996-01-01").cast("timestamp")
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= cut &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,12)")).cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),
    "q_select_limit" -> ((s, d) =>
      Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey").limit(100)),
    "q_type_inference" -> ((s, d) => {
      val withK = Tables.events(s, d)
        .withColumn("k_str", regexp_extract(col("props"), "[0-9]+", 0))
      TypeInference.convertIfNumeric(withK, "k_str")
        .groupBy(col("event_type"))
        .agg((sum(col("k_str").cast("decimal(30,12)")).cast("double") / count(lit(1))).as("k_avg"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q_filter_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_extendedprice").between(1000.0, 5000.0))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_schema_map" -> ((s, d) => {
      val catalog = Seq(
        ("amount", "NUMBER(10,2)"), ("event_time", "DATE"),
        ("flag", "CHAR(1)"), ("id", "NUMBER"), ("name", "VARCHAR2(100)"),
        ("note", "CLOB"), ("updated_at", "TIMESTAMP(6)"))
      s.createDataFrame(
        catalog.map { case (n, t) => (n, t, TypeMapper.mapSourceType(t)) })
        .toDF("column_name", "source_type", "engine_type")
        .orderBy("column_name")
    }),

    // ---- §2b analytics surface ---------------------------------------
    "q1_agg" -> ((s, d) => Analytics.q1Agg(s, d)),
    "q_join_dim" -> ((s, d) => Analytics.joinDim(s, d)),
    "q_multi_join" -> ((s, d) => Analytics.multiJoin(s, d)),
    "q_shipping_priority" -> ((s, d) => Analytics.shippingPriority(s, d)),
    "q_topk" -> ((s, d) => Analytics.topK(s, d)),
    "q_window_rank" -> ((s, d) => Analytics.windowRank(s, d)),
    "q_window_running" -> ((s, d) => Analytics.windowRunning(s, d)),
    "q_distinct_agg" -> ((s, d) => Analytics.distinctAgg(s, d)),
    "q_percentiles" -> ((s, d) => Analytics.percentiles(s, d)),
    "q_window_moving" -> ((s, d) => Analytics.movingAverage(s, d)),
    "q_semi_anti" -> ((s, d) => Analytics.semiAnti(s, d)),
    "q_pivot" -> ((s, d) => Analytics.pivotStatus(s, d)),
    "q_rollup" -> ((s, d) => Analytics.rollupAgg(s, d)),
    "q_cube" -> ((s, d) => Analytics.cubeAgg(s, d)),
    "q_grouping_sets" -> ((s, d) => Analytics.groupingSetsAgg(s, d)),
    "q_set_ops" -> ((s, d) => Analytics.setOps(s, d)),
    "q_having" -> ((s, d) => Analytics.havingAgg(s, d)),
    "q_null_handling" -> ((s, d) => Analytics.nullHandling(s, d)),
    "q_date_parts" -> ((s, d) => Analytics.datePartsAgg(s, d)),
    "q_string_funcs" -> ((s, d) => Analytics.stringFuncs(s, d)),
    "q_asof_join" -> ((s, d) => Analytics.asofJoin(s, d)),
    "q_asof_join_merge" -> ((s, d) => graft.queries.AsOf.asofJoinMerged(s, d)),
    "q_events_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "q_funnel" -> ((s, d) => Analytics.funnel(s, d)),
    "q_retention" -> ((s, d) => Analytics.retentionCohorts(s, d)),

    // ---- §2c LLM-training-data pipeline ------------------------------
    "d_dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "d_pipeline_curate" -> ((s, d) =>
      graft.pipeline.Curation.curate(Tables.spread(Tables.documents(s, d)),
        minQuality = 0.2, keepLangs = Seq("en", "de", "es", "fr", "zh"),
        sampleFraction = 0.9)),
    "d_dedup_minhash" -> ((s, d) =>
      Dedup.lshBuckets(
        Tables.spread(Tables.documents(s, d)).select(col("doc_id"),
          graft.functions.Hashes.minhash_sig(
            graft.functions.Hashes.gram_hashes(col("text"), 3), 32).as("sig")),
        32, 8).orderBy("doc_id", "band_id")),
    "d_dedup_minhash_pairs" -> ((s, d) => {
      // inject a deterministic near-dup per doc (first 3 words dropped,
      // id + 10000) and recover the pairs via MinHash+LSH
      val docs = Tables.documents(s, d)
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
      Dedup.minhashNearDups(
        docs.select("doc_id", "text").unionByName(mutated), 3, 32, 8, 0.5)
    }),
    "d_dedup_minhash_portable" -> ((s, d) => {
      // the SAME injected near-dups as d_dedup_minhash_pairs, but
      // through the portable hash family: md5-mod-2^31 shingle
      // hashes, (2i+1)h + b_i mod 2^31-1 permutations, decimal band
      // strings — the oracle recomputes signatures, buckets, AND the
      // exact-jaccard verification; the whole MinHash+LSH pipeline
      // sits on the hash path
      val docs = Tables.documents(s, d)
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
      Dedup.minhashNearDupsPortable(
        docs.select("doc_id", "text").unionByName(mutated), 3, 32, 8, 0.5)
    }),
    "d_dedup_containment" -> ((s, d) => {
      // the excerpt detector: a 12-word excerpt of every doc
      // (id + 20000) has near-zero Jaccard against its source but
      // containment ~1.0 — candidates from the shingle inverted
      // index (df-capped), exact two-direction containment verify,
      // all on the portable md5-mod-2^31 hash path
      val docs = Tables.documents(s, d)
      val excerpts = docs.select(
        (col("doc_id") + 20000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, 12), ' ')").as("text"))
      Dedup.containmentPairs(
        docs.select("doc_id", "text").unionByName(excerpts),
        3, 0.9, maxShingleDf = 20)
    }),
    "d_dedup_minhash_delta" -> ((s, d) => {
      // incremental ingest: the corpus is the standing index; the new
      // batch is every doc's near-dup copy (first 3 words dropped,
      // id + 10000). Only the batch is shingled/hashed; the index is
      // scanned, never shuffled — pairs match the batch path exactly
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val batch = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
      val index = Dedup.minhashIndex(docs, 3, 32)
      Dedup.minhashNearDupsDelta(index, batch, 3, 32, 8, 0.5)._1
    }),
    "d_dedup_clusters" -> ((s, d) => {
      // pairs from the same injected near-dups as d_dedup_minhash_pairs,
      // resolved into connected components (cluster id = min doc id)
      val docs = Tables.documents(s, d)
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
      val pairs = Dedup.minhashNearDups(
        docs.select("doc_id", "text").unionByName(mutated), 3, 32, 8, 0.5)
      graft.dedup.Clusters.connectedComponents(pairs, "doc_a", "doc_b")
        .orderBy("id")
    }),
    "d_dedup_clusters_sql" -> ((s, d) => {
      // ORACLE-CHECKED connected components: the edge set is fully
      // SQL-expressible (4 mutation levels of each doc; level k links
      // to level k+1 iff exact 3-gram jaccard >= 0.5), forming 4-node
      // CHAINS — min labels need >= 3 propagation rounds, so the
      // iterative CC loop is exercised and hash-checked against a
      // DuckDB recursive-CTE transitive closure.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val copies = (0 to 3).map(k => docs.select(
        (col("doc_id") + 10000 * k).as("doc_id"),
        expr(s"array_join(slice(split(text, ' '), ${3 * k + 1}, 1000000), ' ')").as("text")))
        .reduce(_ unionByName _)
      // shingle strings hash to longs before pairing (distinct-set
      // jaccard unchanged modulo ~2^-64 collisions — same trick as
      // Dedup.minhashNearDups). Level-k links level-k+1 OF THE SAME
      // BASE DOC, so candidate pairing is a lag() window over
      // (base, level) — the shingle pipeline evaluates ONCE and the
      // only exchange is the window shuffle; the previous a⋈b
      // self-join evaluated the whole shingle+hash subtree once per
      // side. The explicit repartition spreads the CPU-bound hashing
      // beyond the corpus file's 4 union-branch splits (no-op on a
      // many-split cluster scan).
      val sh = copies.repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.Hashes.gram_hashes(col("text"), 3).as("shingles"))
      val byBase = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id") % 10000).orderBy(col("doc_id"))
      val pairs = sh
        .withColumn("doc_a", lag(col("doc_id"), 1).over(byBase))
        .withColumn("sh_a", lag(col("shingles"), 1).over(byBase))
        .filter(col("doc_a").isNotNull &&
          size(array_intersect(col("sh_a"), col("shingles"))).cast("double") /
            size(array_union(col("sh_a"), col("shingles"))) >= 0.5)
        .select(col("doc_a"), col("doc_id").as("doc_b"))
      // smallGraphEdges = 0 forces the DISTRIBUTED label-propagation
      // loop (not the small-graph union-find fast path) — this query
      // exists to hash-check the iterative path against DuckDB
      graft.dedup.Clusters.connectedComponents(pairs, "doc_a", "doc_b",
        smallGraphEdges = 0L)
        .orderBy("id")
    }),
    "d_dedup_keep_best" -> ((s, d) => {
      // ORACLE-CHECKED keep-best dedup: the d_dedup_clusters_sql chain
      // corpus with INVERTED level ids — the full text (longest, the
      // "best" member) carries the LARGEST id of its chain, so the
      // keep-best representative provably diverges from the min-id
      // rule on every linked chain. Score = length(text), ties
      // (all-empty truncation chains) fall back to min id on both
      // engines.
      // the copy-level offset derives from max(doc_id) (memoized per
      // corpus dir — see Tables.maxDocId; re-paying the scan-and-agg
      // action every timed run cost the r11 committed median +21%)
      // with a floor of 10000 so the shipped SFs (max base id 4999)
      // keep the exact constants the oracle's recursive CTE hardcodes,
      // while larger corpora (the 8x soak unions id+10M shifted
      // copies) get a collision-free encoding instead of silently
      // folding copy levels together. NOT an assert_true filter:
      // Catalyst's constraint inference propagates filter predicates
      // across the downstream equi-joins, where the assert
      // re-evaluates against POST-offset ids and throws on valid data
      // (observed).
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val off = math.max(10000L, Tables.maxDocId(s, d) + 1L)
      val copies = (0 to 3).map(k => docs.select(
        (col("doc_id") + lit(off) * (3 - k)).as("doc_id"),
        expr(s"array_join(slice(split(text, ' '), ${3 * k + 1}, 1000000), ' ')").as("text")))
        .reduce(_ unionByName _)
      val sh = copies.repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"),
          graft.functions.Hashes.gram_hashes(col("text"), 3).as("shingles"))
      val byBase = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id") % off).orderBy(col("doc_id"))
      val pairs = sh
        .withColumn("doc_a", lag(col("doc_id"), 1).over(byBase))
        .withColumn("sh_a", lag(col("shingles"), 1).over(byBase))
        .filter(col("doc_a").isNotNull &&
          size(array_intersect(col("sh_a"), col("shingles"))).cast("double") /
            size(array_union(col("sh_a"), col("shingles"))) >= 0.5)
        .select(col("doc_a"), col("doc_id").as("doc_b"))
      graft.dedup.Clusters.dedupByComponentsKeepBest(
        copies.withColumn("score", length(col("text"))), pairs, "score")
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")
    }),
    "d_dedup_simhash" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("simhash", Hashes.simhash64(split(col("text"), " ")))
        .withColumn("band", shiftrightunsigned(col("simhash"), 48))
        .select("doc_id", "simhash", "band")
        .orderBy("doc_id")),
    "d_dedup_simhash_pairs" -> ((s, d) => {
      // deterministic near-dup per doc: drop the first 2 words
      // (small token-multiset change => small hamming distance)
      val docs = Tables.documents(s, d)
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 3, 1000000), ' ')").as("text"))
      Dedup.simhashNearDups(
        docs.select("doc_id", "text").unionByName(mutated), 3)
    }),
    "d_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardAdjacent(Tables.documents(s, d), 2)),
    "d_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), 3)
    }),
    "d_ann_filtered" -> ((s, d) => {
      // ATTRIBUTE-FILTERED vector search, exact path: the allowed set
      // comes from a real attribute table (documents.lang = 'en';
      // vec_id aligns with doc_id by construction) and pre-filters
      // the corpus BEFORE scoring — top-k is exact over the subset,
      // no post-filter recall hole. Fully oracle-replayable (the
      // d_cosine_topk math over the semi-joined corpus); the PQ-index
      // form of the same shape is d_ann_pq_filtered
      val emb = Tables.embeddings(s, d)
      val allowed = Tables.documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Similarity.cosineTopK(
        emb.join(allowed, Seq("vec_id"), "left_semi"),
        emb.filter(col("vec_id") < 10), 3)
    }),
    "d_ann_pq_filtered" -> ((s, d) => {
      // the filtered shape on the compressed index: allowed ids
      // semi-join the (id, cell, code) frame before the probe join —
      // non-matching codes never score. Rows-only (float k-means
      // class, the d_ann_pq contract); PqSpec pins filtered ==
      // search-over-allowed-only-index equality
      val emb = Tables.embeddings(s, d)
      val allowed = Tables.documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      val coarse = graft.sim.Ivf.train(emb, 8, 2)
      val cb = graft.sim.Pq.trainResidual(emb, coarse, m = 8, k = 16,
        iters = 2)
      graft.sim.Pq.searchPqFiltered(
        graft.sim.Pq.encodeIndex(emb, coarse, cb),
        emb.filter(col("vec_id") < 10), 3, coarse, cb, nprobe = 2,
        allowed = allowed)
    }),
    "d_ann_lsh" -> ((s, d) =>
      Similarity.lshBucketSizes(Tables.embeddings(s, d), 12)),
    "d_dedup_embed" -> ((s, d) =>
      // exact all-pairs baseline: oracle-checks the verification math
      // at a low threshold where bucketing cannot bound candidates;
      // the scale path is d_dedup_embed_lsh below
      Similarity.nearDupPairs(Tables.spread(Tables.embeddings(s, d)), 0.4)),
    "d_dedup_embed_lsh" -> ((s, d) => {
      // inject an exact duplicate of every vector (vec_id + 10000) and
      // recover the pairs through the bucketed LSH path — candidates
      // come from band-bucket joins, never all-pairs; identical
      // vectors share every band bucket, so recall on the injected
      // dups is exact and the oracle hash-matches
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      Similarity.nearDupPairsLsh(emb.unionByName(dup), 0.95)
    }),
    "d_embed_outliers" -> ((s, d) =>
      // SSL-prototypes pruning signal: cosine of every vector to its
      // k-means prototype. rows-only (float k-means isn't SQL-
      // expressible); exact semantics pinned by SemDedupSpec.
      graft.sim.SemDedup.prototypicality(
        Tables.embeddings(s, d).select("vec_id", "embedding"), nlist = 8)),
    "d_decontaminate_semantic" -> ((s, d) => {
      // embedding-space eval-leak gate: eval set = vecs 0-19; the
      // corpus carries injected exact copies of every eval vec
      // (vec_id + 10000 — cos 1.0 by construction, recall 1) plus
      // whatever organic vectors clear the 0.95 bar. Deterministic
      // cosine math (6dp before argmax) — fully oracle-checked.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val evalSet = emb.filter(col("vec_id") < 20)
      val corpus = emb.filter(col("vec_id") >= 20)
        .unionByName(evalSet.select((col("vec_id") + 10000).as("vec_id"),
          col("embedding")))
      Similarity.semanticDecontaminate(corpus, evalSet, 0.95)
    }),
    "d_semdedup" -> ((s, d) => {
      // SemDeDup: k-means clusters then intra-cluster cosine pruning;
      // injected exact duplicates (vec_id + 10000) are always
      // recovered (identical vector -> identical nearest centroid).
      // rows-only: float k-means isn't cross-engine reproducible;
      // exact semantics are pinned by SemDedupSpec.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      // auto nlist keeps expected cluster membership flat at any
      // volume: per-cluster work is quadratic in members (the
      // paper's knob), so a fixed nlist goes super-linear with the
      // corpus — the scale soak measured exactly that before auto.
      // knownCount: the corpus is source ∪ injected copy = exactly 2×
      // the source files' footer row count — sizing costs no job
      graft.sim.SemDedup.semanticNearDups(emb.unionByName(dup), 0.95, nlist = 0,
        knownCount = 2 * graft.sources.ParquetMeta.rowCount(s, s"$d/embeddings.parquet"))
    }),
    "d_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.sim.Ivf.train(emb, 8, 2)
      graft.sim.Ivf.annIvf(emb, emb.filter(col("vec_id") < 10), 3, cents, 2)
    }),
    "d_ann_ivf_hier" -> ((s, d) => {
      // the nlist-past-the-sample-bound scale path: two-level train +
      // two-level assign/probe (rows-only like d_ann_ivf — k-means
      // argmax chains are not SQL-reproducible; IvfSpec pins exact
      // kernel semantics and recall parity vs the flat path)
      val emb = Tables.embeddings(s, d)
      val idx = graft.sim.Ivf.trainHierarchical(emb, 64, 2, nCoarse = 8)
      graft.sim.Ivf.annIvfHier(emb, emb.filter(col("vec_id") < 10), 3, idx,
        nprobe = 8, nprobeCoarse = 3)
    }),
    "q_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag")),
    "q_skew_profile" -> ((s, d) =>
      graft.ops.Skew.keySkewProfile(Tables.events(s, d), Seq("user_id"), 20)),
    "d_corpus_stats" -> ((s, d) =>
      TextAnalysis.corpusStats(Tables.documents(s, d))),
    "d_lang_id" -> ((s, d) =>
      TextAnalysis.langId(Tables.documents(s, d))
        .select("doc_id", "lang", "pred_lang").orderBy("doc_id")),
    "d_quality_score" -> ((s, d) =>
      TextAnalysis.qualityScore(Tables.documents(s, d))
        .select("doc_id", "n_words", "punct_ratio", "stopword_ratio", "quality")
        .orderBy("doc_id")),
    "d_token_count" -> ((s, d) =>
      TextAnalysis.tokenCounts(Tables.documents(s, d))
        .select("doc_id", "n_chars_calc", "ws_tokens", "bpe_tokens")
        .orderBy("doc_id")),
    "d_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(Tables.documents(s, d))
        .select("doc_id", "fp_md5").orderBy("doc_id")),
    "d_repetition" -> ((s, d) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, d))
        .select("doc_id", "n_words", "dup_word_frac", "n_grams", "dup_3gram_frac")
        .orderBy("doc_id")),
    "d_fingerprint_rolling" -> ((s, d) =>
      // fp_simhash intentionally lives in d_dedup_simhash (its kernel is
      // XxHash64-based — no DuckDB equivalent); keeping this row to the
      // polynomial rolling hash lets it be fully oracle-checked
      Tables.documents(s, d)
        .withColumn("fp_rolling", Hashes.rolling_hash(col("text")))
        .select("doc_id", "fp_rolling").orderBy("doc_id")),
    "d_winnowing" -> ((s, d) =>
      // MOSS winnowing fingerprints (word 3-grams, window 4) — the
      // substring-robust dedup signal; oracle mirrors the per-gram
      // polynomial hash + window-min selection in HUGEINT arithmetic
      graft.text.TextAnalysis.winnowing(
        Tables.documents(s, d).select("doc_id", "text"), 3, 4)
        .orderBy("doc_id")),
    "d_winnowing_pairs" -> ((s, d) => {
      // shared-fingerprint candidate pairs; a 2-word-shifted copy of
      // every doc is injected so true substring near-dups exist by
      // construction (same convention as the CC oracle corpus)
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 3, 1000000), ' ')").as("text"))
      graft.text.TextAnalysis.winnowingPairs(docs.unionByName(mutated), 3, 4, 2, 100)
        .orderBy("doc_a", "doc_b")
    }),
    "d_pii_redact" -> ((s, d) => {
      // the corpus is synthetic word-salad with no PII, so inject a
      // deterministic email/phone/SSN/IP per doc (derived from doc_id)
      // and scrub it — the oracle performs the identical injection
      val id4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
      val withPii = Tables.documents(s, d).withColumn("text", concat(
        col("text"),
        lit(" contact u"), col("doc_id").cast("string"), lit("@example.com or +1-555-"),
        id4, lit(" ssn 123-45-"), id4,
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
      TextAnalysis.redactPii(withPii).select("doc_id", "text").orderBy("doc_id")
    }),
    "d_decontaminate" -> ((s, d) => {
      // eval set = docs 0-19; corpus = docs 20+ plus LEAKED verbatim
      // copies of every 5th eval doc (id + 20000) — those must flag
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") < 20).select("doc_id", "text")
      val leaked = evalSet.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") >= 20)
        .select("doc_id", "text").unionByName(leaked)
      TextAnalysis.decontaminate(corpus, evalSet, 8)
    }),
    "d_blocklist_filter" -> ((s, d) => {
      // content-keyed blocklist anti-join: every doc whose md5(text)
      // matches a blocked fingerprint drops — including exact dups of
      // blocked content under OTHER ids/sources. Bloom-pruned exact
      // anti join: definite-negatives never enter the shuffle
      val docs = Tables.documents(s, d)
      val block = docs.filter(col("source") === "src1" && col("doc_id") % 7 === 0)
        .select(md5(col("text")).as("bad_fp"))
      graft.ops.BloomPrune.antiJoin(docs, block, md5(col("text")), "bad_fp")
        .select("doc_id", "source").orderBy("doc_id")
    }),
    "d_blocklist_hits" -> ((s, d) => {
      // the audit twin: which docs WOULD the blocklist remove
      val docs = Tables.documents(s, d)
      val block = docs.filter(col("source") === "src1" && col("doc_id") % 7 === 0)
        .select(md5(col("text")).as("bad_fp"))
      graft.ops.BloomPrune.semiJoin(docs, block, md5(col("text")), "bad_fp")
        .select("doc_id", "source").orderBy("doc_id")
    }),
    "d_pack_sequences" -> ((s, d) =>
      graft.pipeline.Curation.packSequences(Tables.documents(s, d),
        maxTokens = 512, blockSize = 100)),
    "d_unigram_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d))),
    "d_char_entropy" -> ((s, d) =>
      TextAnalysis.charEntropy(Tables.documents(s, d))),
    // minWords 10: the synthetic docs average ~50 words, so the
    // Gopher default of 50 would gate on word count alone
    "d_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules(Tables.documents(s, d), minWords = 10)),
    "d_html_extract" -> ((s, d) => {
      // crawl-front extraction: wrap each doc's text in a realistic
      // page (head with title/style/script traps, a link-dense nav, a
      // short heading, two content paragraphs — one carrying an inline
      // anchor — and a link-dense footer), then extract. The oracle
      // reconstructs the expected kept text directly from the RAW text
      // (independent of the extractor), so the boilerplate drops and
      // the anchor-text arithmetic are genuinely checked, not mirrored.
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val html = concat(
        lit("<html><head><title>Doc</title><style>p{color:red}</style>"),
        lit("<script>var x = \"<p>trap</p>\";</script></head><body>"),
        lit("<div id=\"nav\"><a href=\"/\">home</a> <a href=\"/a\">about</a> <a href=\"/b\">contact</a></div>"),
        lit("<h2>Section</h2><p>"), col("text"), lit("</p>"),
        lit("<p>See <a href=\"/ref\">the reference</a> for details: "),
        upper(col("text")), lit("</p>"),
        // numeric character references (dec + hex) and the
        // double-escape: decodes to "It’s 5 < 7 &amp; fine — really"
        // (30 chars, no anchors -> always kept)
        lit("<p>It&#8217;s 5 &#x3C; 7 &amp;amp; fine &#8212; really</p>"),
        lit("<div class=\"footer\"><a href=\"/tos\">terms</a> (c) 2026</div></body></html>"))
      graft.text.HtmlExtract.extract(
        docs.select(col("doc_id"), html.as("html")))
        .orderBy("doc_id")
    }),
    "d_url_filter" -> ((s, d) => {
      // provenance gate: synthesize a deterministic crawl URL per doc
      // (mixed case, www/default-port/fragment/tracking noise; every
      // 5th doc under a co.uk multi-part suffix with an archive.
      // subdomain), canonicalize, extract the registered domain, and
      // anti-join a blocklist derived from the source ids (every 4th
      // source blocked — BOTH its host shapes must drop). The oracle
      // reconstructs canonical urls + domains from source/doc_id
      // directly, so the canonicalization rules are checked, not
      // mirrored.
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val url = when(col("doc_id") % 5 === 0,
        concat(lit("HTTP://Archive."), col("source"), lit(".CO.UK:80/doc/"),
          col("doc_id"), lit("?utm_source=crawl&id="), col("doc_id"), lit("#top")))
        .otherwise(concat(lit("HTTPS://WWW.Example-"), col("source"),
          lit(".COM:443/Doc/"), col("doc_id"), lit("?id="), col("doc_id"),
          lit("&ref=rss")))
      val withUrl = docs.withColumn("url", url)
      val blockedSrc = withUrl.select("source").distinct()
        .filter(substring(col("source"), 4, 10).cast("int") % 4 === 0)
      val block = blockedSrc
        .select(concat(lit("example-"), col("source"), lit(".com")).as("domain"))
        .unionByName(blockedSrc
          .select(concat(col("source"), lit(".co.uk")).as("domain")))
      graft.ops.UrlOps.urlFilter(withUrl, block)
        .select("doc_id", "url", "domain").orderBy("doc_id")
    }),
    "d_crawl_pipeline" -> ((s, d) => {
      // the assembled crawl front door, end to end: serialize each doc
      // as an HTTP-response WARC record (uri = the synthetic crawl
      // url, payload = HTTP headers + the d_html_extract page around
      // the text), concatenate every 500 records into a blob, then run the
      // full chain — byte walk -> httpBody strip -> URL canonicalize +
      // domain blocklist -> block extraction -> per-domain doc/token
      // stats. The oracle reconstructs every stage's outcome from
      // (doc_id, source, text) alone, so a fault ANYWHERE in the chain
      // (header arithmetic, canonicalization, boilerplate rule, token
      // split) breaks the hash.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val url = when(col("doc_id") % 5 === 0,
        concat(lit("HTTP://Archive."), col("source"), lit(".CO.UK:80/doc/"),
          col("doc_id"), lit("?utm_source=crawl&id="), col("doc_id"), lit("#top")))
        .otherwise(concat(lit("HTTPS://WWW.Example-"), col("source"),
          lit(".COM:443/Doc/"), col("doc_id"), lit("?id="), col("doc_id"),
          lit("&ref=rss")))
      val html = concat(
        lit("<html><head><title>Doc</title><style>p{color:red}</style>"),
        lit("<script>var x = \"<p>trap</p>\";</script></head><body>"),
        lit("<div id=\"nav\"><a href=\"/\">home</a> <a href=\"/a\">about</a> <a href=\"/b\">contact</a></div>"),
        lit("<h2>Section</h2><p>"), col("text"), lit("</p>"),
        lit("<p>See <a href=\"/ref\">the reference</a> for details: "),
        upper(col("text")), lit("</p>"),
        lit("<div class=\"footer\"><a href=\"/tos\">terms</a> (c) 2026</div></body></html>"))
      val recs = docs.select(col("doc_id"), url.as("url"), html.as("html"))
        .as[(Long, String, String)]
        .map { case (id, u, h) =>
          (id / 500, id, graft.sources.Warc.writeRecord("response", u, "text/html",
            ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + h)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      val records = warcBlobs(recs)
        .flatMap { blob =>
          val p = graft.sources.Warc.parseRecords(blob)
          require(p.quarantinedAt == -1L,
            s"crawl blob must parse cleanly, quarantined at ${p.quarantinedAt}")
          // payloads stay FULL HTTP messages — Crawl.curate owns the
          // envelope strip, and this entry must exercise that path
          p.records.map(r => (r.warcType, r.targetUri, r.payload))
        }.toDF("warc_type", "target_uri", "payload")
      val blockedSrc = docs.select("source").distinct()
        .filter(substring(col("source"), 4, 10).cast("int") % 4 === 0)
      val block = blockedSrc
        .select(concat(lit("example-"), col("source"), lit(".com")).as("domain"))
        .unionByName(blockedSrc
          .select(concat(col("source"), lit(".co.uk")).as("domain")))
      graft.pipeline.Crawl.curate(records, block)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_blocks_dropped").as("n_blocks_dropped"))
        .orderBy("domain")
    }),
    "d_url_dedup" -> ((s, d) => {
      // crawl re-fetch dedup: every doc arrives twice — an old fetch
      // under a noisy URL (www/case/port/tracking variants) and a
      // re-crawl under the clean URL with updated text. Both
      // canonicalize to the SAME url; keep-newest (fetch_id desc) must
      // surface the updated text with n_fetches = 2. The oracle
      // reconstructs the canonical url + surviving text per doc.
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val oldFetch = docs.select(
        concat(lit("HTTPS://WWW.Example-"), col("source"), lit(".COM:443/Doc/"),
          col("doc_id"), lit("?utm_source=feed")).as("url"),
        col("text"), (col("doc_id") * 2).as("fetch_id"), col("doc_id"))
      val reFetch = docs.select(
        concat(lit("https://example-"), col("source"), lit(".com/Doc/"),
          col("doc_id")).as("url"),
        concat(lit("updated: "), col("text")).as("text"),
        (col("doc_id") * 2 + 1).as("fetch_id"), col("doc_id"))
      graft.ops.UrlOps.dedupByUrl(
        oldFetch.unionByName(reFetch), scoreCol = "fetch_id", tieCol = "doc_id")
        .select(col("url"), col("text"), col("n_fetches"))
        .orderBy("url")
    }),
    "d_url_domain_stats" -> ((s, d) => {
      // per-registered-domain corpus profile over the same synthetic
      // crawl urls — the provenance stats that feed domainMix /
      // shardReport when `source` arrives as a URL, not a label
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val url = when(col("doc_id") % 5 === 0,
        concat(lit("HTTP://Archive."), col("source"), lit(".CO.UK:80/doc/"),
          col("doc_id"), lit("?utm_source=crawl&id="), col("doc_id"), lit("#top")))
        .otherwise(concat(lit("HTTPS://WWW.Example-"), col("source"),
          lit(".COM:443/Doc/"), col("doc_id"), lit("?id="), col("doc_id"),
          lit("&ref=rss")))
      graft.ops.UrlOps.domainStats(docs.withColumn("url", url))
    }),
    "d_crawl_gates" -> ((s, d) => {
      // the FULLY-gated crawl front door in one call: percent-encoded
      // url noise (%61 -> a), a domain blocklist (every 4th source), a
      // retroactive robots.txt snapshot (every 5th source disallows
      // /page/), and page-level noindex opt-outs (every 7th doc) all
      // compose inside Crawl.curate. The oracle derives each gate's
      // verdict from doc_id/source arithmetic alone — a fault in any
      // gate (or in their ordering) breaks the hash.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val url = concat(lit("HTTPS://WWW."), col("source"),
        lit(".example/p%61ge/"), col("doc_id"))
      val html = concat(
        when(col("doc_id") % 7 === 0,
          lit("<meta name=\"robots\" content=\"noindex\">")).otherwise(lit("")),
        lit("<p>"), col("text"), lit("</p>"))
      val records = docs.select(
        lit("response").as("warc_type"), url.as("target_uri"),
        concat(lit("HTTP/1.1 200 OK\r\n\r\n"), html).cast("binary").as("payload"))
      val srcN = substring(col("source"), 4, 10).cast("int")
      val blocked = docs.select("source").distinct().filter(srcN % 4 === 0)
        .select(concat(col("source"), lit(".example")).as("domain"))
      val robots = docs.select("source").distinct().filter(srcN % 5 === 0)
        .select(concat(col("source"), lit(".example")).as("host"),
          lit("User-agent: *\nDisallow: /page/\n").as("robots_txt"))
      graft.pipeline.Crawl.curate(records, blocked,
          robots = Some(robots), agent = "graftbot", dropNoindex = true)
        .select("url", "n_tokens").orderBy("url")
    }),
    "d_link_graph" -> ((s, d) => {
      // link-graph extraction: each doc's page carries the five
      // resolvable link forms (absolute, root-relative, path-relative,
      // protocol-relative, nofollow) plus a fragment-only anchor that
      // must drop; the oracle reconstructs every edge by string
      // arithmetic from doc_id/source.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"), lit("/index.html"))
      val html = concat(
        lit("<p>intro</p><a href=\"https://ext.example/d/"), col("doc_id"),
        lit("\">external "), col("doc_id"), lit("</a>"),
        lit("<a href='/doc/"), col("doc_id") + 1, lit("'>next doc</a>"),
        lit("<a href=sub/page.html>sub page</a>"),
        lit("<a href=\"//cdn.example/lib.js\">cdn asset</a>"),
        lit("<a href=\"/tos\" rel=\"nofollow\">terms</a>"),
        lit("<a href=\"#top\">top</a>"))
      graft.text.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), base.as("url"), html.as("html")))
        .select("doc_id", "href", "anchor_text", "nofollow")
        .orderBy("doc_id", "href")
    }),
    "d_crawl_frontier" -> ((s, d) => {
      // frontier discovery over the d_link_graph synthesis plus two
      // fetched-hit links: the plain self link and its utm-tracking
      // variant both canonicalize to the page's own (fetched) url and
      // anti-join away; the nofollow /tos link is not discovered;
      // everything else is unseen — cdn.example collects the whole
      // corpus's in-links, per-doc targets keep one each.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"), lit("/index.html"))
      val html = concat(
        lit("<p>intro</p><a href=\"https://ext.example/d/"), col("doc_id"),
        lit("\">external "), col("doc_id"), lit("</a>"),
        lit("<a href='/doc/"), col("doc_id") + 1, lit("'>next doc</a>"),
        lit("<a href=sub/page.html>sub page</a>"),
        lit("<a href=\"//cdn.example/lib.js\">cdn asset</a>"),
        lit("<a href=\"/tos\" rel=\"nofollow\">terms</a>"),
        lit("<a href=\"index.html\">self</a>"),
        lit("<a href=\"index.html?utm_source=feed\">self promo</a>"))
      val edges = graft.text.HtmlExtract.extractLinks(
        docs.select(col("doc_id"), base.as("url"), html.as("html")))
      graft.pipeline.Crawl.frontier(edges, docs.select(base.as("url")))
        .orderBy(desc("n_inlinks"), asc("url"))
    }),
    "d_crawl_frontier_ranked" -> ((s, d) => {
      // the TrustRank crawl loop end-to-end: seeded (personalized)
      // PageRank over the domain ring+hub graph feeds
      // frontier(ranks=...), so unfetched urls order by
      // proximity-to-the-trusted-set (the 5 lexicographically-first
      // domains). A PSL snapshot keeps the frontier's domain key
      // equal to the graph's node key (src0.example.com stays a
      // distinct registered domain); off-graph domains (ext/cdn)
      // coalesce to rank 0. The oracle unrolls the 3 seeded
      // iterations and rebuilds the candidate set by arithmetic.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val dom = concat(col("source"), lit(".example.com"))
      val base = concat(lit("https://"), dom,
        lit("/a/"), col("doc_id"), lit("/index.html"))
      val html = concat(
        lit("<p>intro</p><a href=\"https://ext.example/d/"), col("doc_id"),
        lit("\">external "), col("doc_id"), lit("</a>"),
        lit("<a href='/doc/"), col("doc_id") + 1, lit("'>next doc</a>"),
        lit("<a href=sub/page.html>sub page</a>"),
        lit("<a href=\"//cdn.example/lib.js\">cdn asset</a>"))
      val edges = graft.text.HtmlExtract.extractLinks(
        docs.select(col("doc_id"), base.as("url"), html.as("html")))
      val doms = docs.select(dom.as("domain")).distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("domain")
      val ring = doms.select(col("domain").as("src"),
        coalesce(lead(col("domain"), 1).over(w),
          first(col("domain")).over(w)).as("dst"))
      val toHub = doms.select(col("domain").as("src"),
        lit("hub.example").as("dst"))
      val seeds = doms.orderBy("domain").limit(5).select(col("domain").as("n"))
      val pr = graft.ops.LinkGraph.pageRank(ring.unionByName(toHub),
        iters = 3, seeds = Some(seeds), probeEvery = 3)
      val psl = Seq("com", "example.com").toDF("suffix")
      graft.pipeline.Crawl.frontier(edges, docs.select(base.as("url")),
          ranks = Some(pr), psl = Some(psl))
        .orderBy(desc("rank"), desc("n_inlinks"), asc("url"))
    }),
    "d_sitemap" -> ((s, d) => {
      // one sitemap blob per doc: three <url> entries (full hints;
      // an XML-escaped loc that must decode; a malformed priority
      // that must null, not throw under ANSI) plus a <sitemapindex>
      // pointer — every field rebuilt by arithmetic. The \b in the
      // entry pattern keeps <urlset>/<sitemapindex> wrappers from
      // matching as entries.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val lm = concat(lit("2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"), lit("</loc><lastmod>"), lm,
        lit("</lastmod><changefreq>daily</changefreq><priority>0.8</priority></url>"),
        lit("<url><loc>https://"), col("source"), lit(".example.com/q?a=1&amp;b="),
        col("doc_id"), lit("</loc></url>"),
        lit("<url><loc>https://"), col("source"), lit(".example.com/p/"), col("doc_id"),
        lit("</loc><priority>often</priority></url></urlset>"),
        lit("<sitemapindex><sitemap><loc>https://"), col("source"),
        lit(".example.com/sitemap-"), col("doc_id"),
        lit(".xml</loc></sitemap></sitemapindex>"))
      graft.ops.Sitemaps.parse(docs.select(col("doc_id"), xml.as("xml")))
        .orderBy("doc_id", "kind", "loc")
    }),
    "d_fetch_schedule" -> ((s, d) => {
      // politeness waves over the d_crawl_frontier output: each
      // host's candidates rank by (in-links desc, url) and spill
      // into waves of 2; the oracle replays the per-host window
      // arithmetic.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"), lit("/index.html"))
      val html = concat(
        lit("<p>intro</p><a href=\"https://ext.example/d/"), col("doc_id"),
        lit("\">external "), col("doc_id"), lit("</a>"),
        lit("<a href='/doc/"), col("doc_id") + 1, lit("'>next doc</a>"),
        lit("<a href=sub/page.html>sub page</a>"),
        lit("<a href=\"//cdn.example/lib.js\">cdn asset</a>"),
        lit("<a href=\"/tos\" rel=\"nofollow\">terms</a>"))
      val edges = graft.text.HtmlExtract.extractLinks(
        docs.select(col("doc_id"), base.as("url"), html.as("html")))
      val front = graft.pipeline.Crawl.frontier(edges, docs.select(base.as("url")))
      graft.pipeline.Crawl.fetchSchedule(front, perHostPerWave = 2)
        .select("url", "host", "n_inlinks", "wave", "slot")
        .orderBy("host", "wave", "slot")
    }),
    "d_crawl_diff" -> ((s, d) => {
      // snapshot diff between two synthesized fetch waves: wave 2
      // drops doc_id%5 (gone), rewrites text for doc_id%3 (changed),
      // keeps the rest byte-identical (unchanged), and discovers a
      // /p2 page for doc_id%7 (added). Fingerprint = md5(text); the
      // oracle rebuilds every status from the same arithmetic.
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"))
      val prev = docs.select(url.as("url"), md5(col("text")).as("fingerprint"))
      val curr = docs.filter(col("doc_id") % 5 =!= 0)
        .select(url.as("url"),
          md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fingerprint"))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select(concat(url, lit("/p2")).as("url"),
            md5(concat(col("text"), lit(" p2"))).as("fingerprint")))
      graft.pipeline.Crawl.snapshotDiff(prev, curr).orderBy("url")
    }),
    "d_fetch_delay" -> ((s, d) => {
      // politeness TIMING: per-host robots.txt synthesized by source
      // suffix arithmetic — n%3==0 hosts give graftbot a specific
      // 2.5s group (beating the * group's 9), n%3==1 declare 7s for
      // everyone, the rest declare none (default 5.0 applies); waves
      // of 2 per host, fetch_at = wave * delay
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val frontier = docs.select(
        concat(lit("https://"), col("source"), lit(".example.com/p/"),
          col("doc_id")).as("url"),
        (col("doc_id") % 7).as("n_inlinks"))
      val robots = docs.select("source").distinct()
        .withColumn("host", concat(col("source"), lit(".example.com")))
        .withColumn("n", expr("CAST(substring(source, 4) AS INT)"))
        .withColumn("robots_txt",
          when(col("n") % 3 === 0, lit(
            "User-agent: graftbot\nCrawl-delay: 2.5\n\nUser-agent: *\nCrawl-delay: 9"))
          .when(col("n") % 3 === 1, lit(
            "User-agent: *\nCrawl-delay: 7\nDisallow: /tmp"))
          .otherwise(lit("User-agent: *\nDisallow: /private")))
      val delays = robots.select(col("host"),
        graft.ops.Robots.crawl_delay(col("robots_txt"), "graftbot")
          .as("crawl_delay"))
      graft.pipeline.Crawl.fetchScheduleWithDelay(
        frontier, delays, 5.0, perHostPerWave = 2).orderBy("url")
    }),
    "d_recrawl_rate" -> ((s, d) => {
      // change-rate estimation over a synthesized 5-wave fetch
      // history: wave v (1..4) of a doc changes iff
      // md5(doc|v) % 100 < doc_id % 100, so the fingerprint is the
      // cumulative change count — per-doc change propensity varies
      // 0..99% and the oracle rebuilds X per url from arithmetic
      val docs = Tables.documents(s, d)
      val fetches = docs.select(
          concat(lit("https://site-"), col("doc_id") % 20,
            lit(".example/p/"), col("doc_id")).as("url"),
          col("doc_id"),
          explode(sequence(lit(0), lit(4))).as("wave"))
        .withColumn("fingerprint", expr(
          """CASE WHEN wave = 0 THEN 0 ELSE size(filter(sequence(1, wave),
            |  v -> CAST(conv(substring(md5(concat(doc_id, '|', v)), 1, 12), 16, 10) AS BIGINT)
            |       % 100 < doc_id % 100)) END""".stripMargin).cast("string"))
        .drop("doc_id")
      graft.pipeline.Crawl.recrawlRate(fetches, 7.0, 365.0).orderBy("url")
    }),
    "d_anchor_text" -> ((s, d) => {
      // anchor-text aggregation over the d_link_graph edge synthesis:
      // the nofollow /tos links must contribute NO signal, the shared
      // cdn target accumulates the whole corpus's in-links, and every
      // per-doc target keeps its single anchor. Oracle rebuilds each
      // aggregate row by arithmetic.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/a/"), col("doc_id"), lit("/index.html"))
      val html = concat(
        lit("<p>intro</p><a href=\"https://ext.example/d/"), col("doc_id"),
        lit("\">external "), col("doc_id"), lit("</a>"),
        lit("<a href='/doc/"), col("doc_id") + 1, lit("'>next doc</a>"),
        lit("<a href=sub/page.html>sub page</a>"),
        lit("<a href=\"//cdn.example/lib.js\">cdn asset</a>"),
        lit("<a href=\"/tos\" rel=\"nofollow\">terms</a>"),
        lit("<a href=\"#top\">top</a>"))
      val edges = graft.text.HtmlExtract.extractLinks(
        docs.select(col("doc_id"), base.as("url"), html.as("html")))
      graft.ops.LinkGraph.anchorTexts(edges, k = 3)
        .orderBy("href")
    }),
    "d_domain_rank" -> ((s, d) => {
      // domain PageRank over a deterministic ring-plus-hub graph built
      // from the distinct sources: every source links to its
      // lexicographic successor (wrapping) and to a hub that links
      // nowhere (dangling). 5 synchronous iterations; the oracle
      // unrolls the identical arithmetic in SQL. probeEvery = iters:
      // on a tiny graph the per-round probe job is pure scheduling
      // latency, so the rounds chain lazily into ONE job + checkpoint
      // on the final round (bit-identical output — the probe knob
      // never touches the arithmetic; LinkGraphSpec pins it).
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      graft.ops.LinkGraph.pageRank(
          ring.unionByName(toHub), iters = 5, probeEvery = 5)
        .orderBy(desc("rank"), asc("n"))
    }),
    "d_domain_rank_dangling" -> ((s, d) => {
      // same ring-plus-hub graph as d_domain_rank, standard
      // formulation: each iteration's dangling mass (the hub links
      // nowhere) is redistributed uniformly, so ranks stay a
      // probability distribution — the mode for thresholding on
      // absolute rank or mixing ranks across graphs. The oracle
      // unrolls the identical arithmetic (dangling sum as exact
      // decimal over the 9dp ranks).
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      graft.ops.LinkGraph.pageRank(
          ring.unionByName(toHub), iters = 5, redistributeDangling = true)
        .orderBy(desc("rank"), asc("n"))
    }),
    "d_domain_rank_seeded" -> ((s, d) => {
      // personalized PageRank (the TrustRank shape) on the same
      // ring-plus-hub graph: teleport restricted to the five
      // lexicographically-first sources, dangling mass re-entering
      // through the same seed teleport — rank becomes proximity to
      // the trusted set. The oracle unrolls the identical arithmetic
      // with per-node seed CASE terms.
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      val seeds = srcs.orderBy("source").limit(5)
        .select(col("source").as("n"))
      graft.ops.LinkGraph.pageRank(
          ring.unionByName(toHub), iters = 5, redistributeDangling = true,
          seeds = Some(seeds))
        .orderBy(desc("rank"), asc("n"))
    }),
    "d_harmonic" -> ((s, d) => {
      // harmonic centrality (exact ball-expansion mode) over the same
      // ring-plus-hub graph as d_domain_rank, truncated at distance 4:
      // the hub collects every source at distance 1 (H = |S|), ring
      // nodes see exactly their 4 nearest predecessors (H = 1 + 1/2 +
      // 1/3 + 1/4). The oracle walks the graph with a recursive CTE
      // and recomputes min-distances independently of the ball
      // algebra.
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      graft.ops.LinkGraph.harmonicCentrality(
          ring.unionByName(toHub), maxDist = 4)
        .orderBy("n")
    }),
    "d_curriculum" -> ((s, d) => {
      // deterministic curriculum order: quartile buckets over a
      // synthetic quality score, portable md5 shuffle within bucket;
      // the oracle recomputes the exact quantile cuts (quantile_cont
      // == exact percentile, pinned in round 10) and the same md5
      // keys.
      val docs = Tables.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 97).cast("double").as("score"))
      graft.ops.Sampling.curriculumOrder(docs)
        .orderBy("bucket", "shuffle_key")
    }),
    "d_embed_pca" -> ((s, d) => {
      // PCA dimensionality cut over the embeddings table: fit the
      // top-2 components (dim-bounded treeAggregate + driver power
      // iteration) and project every row. Rows-only by construction
      // (float-sum determinism class, like k-means/IVF training);
      // the spec pins planted-axis recovery, orthonormality, and
      // hand-checked projections.
      val emb = Tables.embeddings(s, d)
      val m = graft.sim.Pca.fit(emb, k = 2)
      graft.sim.Pca.project(emb, m)
        .select(col("vec_id"),
          round(element_at(col("pca"), 1), 6).as("p1"),
          round(element_at(col("pca"), 2), 6).as("p2"))
        .orderBy("vec_id")
    }),
    "d_token_budget" -> ((s, d) => {
      // quality-first fill under a fixed TOKEN budget: score =
      // doc_id % 100 (deterministic quality proxy), tokens = word
      // count; keep the (score desc, doc_id) prefix whose inclusive
      // running token total stays within 15000. The oracle replays
      // the running sum as a SQL window.
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        (col("doc_id") % 100).cast("double").as("score"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.ops.Sampling.selectByTokenBudget(docs, budget = 15000L)
        .orderBy(desc("score"), asc("doc_id"))
    }),
    "d_script_detect" -> ((s, d) => {
      // Unicode script mix: plant per-doc Cyrillic and CJK runs next
      // to the Latin base text, so every count, fraction, and the
      // dominance CASE replay in the oracle. The planted chars come
      // from literal arrays — Spark's chr() is mod-256 ASCII, unlike
      // DuckDB's codepoint chr(), so the codepoints are baked in as
      // literals on this side and chr() arithmetic on the oracle side
      val cyr = (0 until 32).map(i => (0x410 + i).toChar.toString)
      val cjk = (0 until 64).map(i => (0x4E00 + i).toChar.toString)
      val docs = Tables.documents(s, d)
        .withColumn("__c1",
          element_at(array(cyr.map(lit): _*), (col("doc_id") % 32 + 1).cast("int")))
        .withColumn("__c2",
          element_at(array(cjk.map(lit): _*), (col("doc_id") % 64 + 1).cast("int")))
        .select(col("doc_id"),
          concat(col("text"), lit(" "),
            expr("repeat(__c1, CAST(doc_id % 7 AS INT))"),
            expr("repeat(__c2, CAST(doc_id % 5 AS INT))")).as("text"))
      graft.text.TextAnalysis.scriptMix(docs)
        .select("doc_id", "n_chars", "n_latin", "n_cyrillic", "n_greek",
          "n_arabic", "n_cjk", "n_digit", "frac_latin", "frac_cyrillic",
          "frac_cjk", "dominant_script")
        .orderBy("doc_id")
    }),
    "q_sync_evolve" -> ((s, d) => {
      // incremental sync across schema drift: the standing target is
      // v0 (price stored FLOAT, has priority); the fresh batch is v1
      // for every third key (price widened to DOUBLE, new status
      // column, priority dropped from the feed). evolveSchema widens
      // price, null-fills both directions, and the keep-latest upsert
      // picks v1 where it exists — every cell is CASE-expressible.
      val orders = Tables.orders(s, d)
      val target = orders.select(col("o_orderkey"),
        col("o_totalprice").cast("float").as("price"),
        col("o_orderpriority").as("priority"),
        lit(0).as("ver"))
      val batch = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          col("o_totalprice").as("price"),
          lit("B").as("status"),
          lit(1).as("ver"))
      graft.sync.SyncOps.applyIncrementalEvolved(
          target, batch, Seq("o_orderkey"), "ver", "o_orderkey")
        .orderBy("o_orderkey")
    }),
    "d_bpe_encode" -> ((s, d) => {
      // BPE INFERENCE on the hash path: a fixed 8-merge table (two
      // chained merges exercise rank order) applied by the JVM greedy
      // lowest-rank-first encoder; the oracle replays the merges as
      // sequential non-overlapping replace() passes over a
      // '|'-decorated symbol string — equivalent by the classic
      // in-order == greedy BPE property (chained outputs only feed
      // LATER-ranked merges; the spec cross-checks on corpus words)
      graft.text.Bpe.encode(Tables.documents(s, d), SparkEntry.bpeMerges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy("doc_id")
    }),
    "d_bpe_encode_bytes" -> ((s, d) => {
      // BYTE-level BPE (the GPT-2-family form): base symbols are
      // uppercase hex pairs of each word's UTF-8 bytes, so multibyte
      // characters split into byte symbols and STILL encode — no
      // [UNK] exists. The appended ' café 的' marker exercises real
      // multibyte fallback (C3A9, E79A84); the oracle replays the
      // fixed merges over DuckDB's hex() of the same words
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" café 的")).as("text"))
      graft.text.Bpe.encodeBytes(docs, SparkEntry.bpeByteMerges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy("doc_id")
    }),
    "d_bpe_fertility" -> ((s, d) =>
      // tokens-per-word from the encode output ALONE: word counts
      // recovered from the </w> markers, no corpus join
      graft.text.Bpe.fertility(
        graft.text.Bpe.encode(Tables.documents(s, d), SparkEntry.bpeMerges))
        .orderBy("doc_id")),
    "d_unigram_tok_train" -> ((s, d) => {
      // unigram-LM (SentencePiece) vocabulary training: substring
      // seeding, distributed soft-EM over the word-freq table (counts
      // aggregate as exact decimals — partition-invariant), 0.75-
      // shrink pruning to the target size. Float EM class: rows-only
      // + the hand-EM spec (UnigramSpec)
      import s.implicits._
      val m = graft.text.Unigram.train(Tables.documents(s, d),
        vocabSize = 300, seedSize = 800, maxPieceLen = 6, emRounds = 2)
      m.pieces.toSeq.toDF("piece", "logp")
        .select(col("piece"), round(col("logp"), 6).as("logp"))
        .orderBy("piece")
    }),
    "d_unigram_encode" -> ((s, d) =>
      // Viterbi INFERENCE on the hash path under the frozen integer-
      // cost model: the oracle re-derives each distinct word's
      // optimal (cost, token-count) by recursive-CTE enumeration of
      // reachable DP states — algebraically independent of the
      // engine's left-to-right Viterbi array
      graft.text.Unigram.encode(Tables.documents(s, d),
          SparkEntry.unigramFrozen)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          (col("total_logp") * lit(-1.0)).cast("long").as("total_cost"))
        .orderBy("doc_id")),
    "d_unigram_sample" -> ((s, d) =>
      // subword-REGULARIZED encode (the Kudo paper's point): one
      // exact P(x)^alpha sample per word, deterministically seeded
      // per (seed, doc, word ordinal) — reproducible, partition-
      // independent, but not SQL-replayable (splitmix RNG): rows-only
      // + the segmentation-law spec (UnigramSpec)
      graft.text.Unigram.encodeSampled(Tables.documents(s, d),
          SparkEntry.unigramFrozen, alpha = 0.5, seed = 42L)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy("doc_id")),
    "d_wordpiece_encode" -> ((s, d) =>
      // WordPiece INFERENCE on the hash path: greedy longest-match
      // under the frozen `##`-prefixed vocabulary, whole-word [UNK]
      // on failure (the BERT rule); the oracle re-derives each
      // distinct word's greedy path by recursive-CTE walk over
      // per-position longest matches — same function, independent
      // mechanics
      graft.text.Wordpiece.encode(Tables.documents(s, d),
          SparkEntry.wordpieceFrozen)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy("doc_id")),
    "d_wordpiece_pairs" -> ((s, d) =>
      // WordPiece training's round-0 LIKELIHOOD ranking as a
      // declarative query: score = cnt/(ca*cb) in double — one
      // multiply + one divide, IEEE-identical in any engine
      graft.text.Wordpiece.initialPairScores(Tables.documents(s, d),
        limit = 50)),
    "q_funnel_windowed" -> ((s, d) =>
      // the funnel with a 2-hour per-step conversion window — a
      // chain spread over a month is not a conversion
      Analytics.funnelWindowed(s, d, maxGapSeconds = 7200)),
    "q_anomaly_zscore" -> ((s, d) =>
      // per-type hourly volume scored against the series' own mean/σ
      Analytics.anomalyZscore(Tables.events(s, d),
        "event_type", "ts", "1 hour", 2.5)
        .orderBy("event_type", "bucket_ts")),
    "q_event_transitions" -> ((s, d) =>
      // first-order Markov transitions over each user's event stream
      Analytics.eventTransitions(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type")),
    "d_license_detect" -> ((s, d) => {
      // a mixed corpus: every third doc becomes source code with a
      // planted license header rotating by doc_id % 4 (SPDX MIT /
      // GPL phrase / public-domain phrase / none); the oracle replays
      // the same RE2-compatible markers, so even an accidental prose
      // match stays hash-identical
      graft.text.CodeText.detectLicense(
        SparkEntry.mixedCodeCorpus(Tables.documents(s, d))).orderBy("doc_id")
    }),
    "d_code_detect" -> ((s, d) =>
      // code-vs-prose over the same mixed corpus: symbol density,
      // indentation, and end-of-line structure — a disjunction
      // because Python-style and minified-style each defeat one signal
      graft.text.CodeText.detectCode(
        SparkEntry.mixedCodeCorpus(Tables.documents(s, d))).orderBy("doc_id")),
    "d_markdown_strip" -> ((s, d) => {
      // markdown synthesized from the corpus by indexed arithmetic
      // (every 23rd word becomes a link, 29th bold, 31st a code span;
      // header/quote/fence/list/rule/image furniture around it), then
      // the fixed RE2-compatible strip chain — the SAME chain replays
      // in DuckDB, so the stripped text itself is on the hash path
      val body = expr(
        """array_join(transform(split(text, ' '), (w, i) ->
          |  CASE WHEN (i + 1) % 23 = 0 THEN concat('[', w, '](https://x.example/', i + 1, ')')
          |       WHEN (i + 1) % 29 = 0 THEN concat('**', w, '**')
          |       WHEN (i + 1) % 31 = 0 THEN concat('`', w, '`')
          |       ELSE w END), ' ')""".stripMargin)
      val md = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("# Doc "), col("doc_id"), lit("\n\n> intro quote\n\n"),
          body,
          lit("\n\n```\nlet x = 1;\n```\n\n- alpha\n- beta\n\n---\n" +
            "![logo](https://x.example/logo.png)")).as("text"))
      graft.text.Markdown.strip(md).orderBy("doc_id")
    }),
    "d_weighted_sample" -> ((s, d) => {
      // A-ES weighted sample without replacement, weight = word count
      // (longer docs proportionally likelier) — the whole draw
      // re-derivable from (salt, doc_id, weight) in any engine
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("weight"))
      graft.ops.Sampling.weightedSamplePortable(docs, 200, "weight", "doc_id")
        .orderBy("doc_id")
    }),
    "q_sync_deletes" -> ((s, d) => {
      // source-side DELETE propagation: the source's current key set
      // lost the %97 keys and gained alien +5000000 keys the target
      // has never synced; tombstones = exactly the %97 target rows
      // (the alien keys must NOT surface — anti-join direction)
      val orders = Tables.orders(s, d)
      val sourceNow = orders.filter(col("o_orderkey") % 97 =!= 0)
        .unionByName(orders.filter(col("o_orderkey") % 41 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 5000000))
      graft.sync.SyncOps.detectDeletes(orders, sourceNow, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
    "q_cdc_apply" -> ((s, d) => {
      // a synthesized change feed over orders: %7 updated (ver 1),
      // %11 deleted (ver 2), %13 re-updated (ver 3 — overrides the
      // delete where both apply), %17 inserted as new +6000000 keys;
      // keep-latest per key, final deletes drop, untouched pass
      val o = Tables.orders(s, d)
      def entry(df: org.apache.spark.sql.DataFrame,
                prio: org.apache.spark.sql.Column,
                op: String, ver: Int, shift: Long) =
        df.select((col("o_orderkey") + shift).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), prio.as("o_orderpriority"),
          lit(op).as("op"), lit(ver).as("ver"))
      val log = entry(o.filter(col("o_orderkey") % 7 === 0), lit("CDC-UPD"), "update", 1, 0)
        .unionByName(entry(o.filter(col("o_orderkey") % 11 === 0),
          lit(null).cast("string"), "delete", 2, 0))
        .unionByName(entry(o.filter(col("o_orderkey") % 13 === 0), lit("CDC-UPD2"), "update", 3, 0))
        .unionByName(entry(o.filter(col("o_orderkey") % 17 === 0), lit("CDC-NEW"), "insert", 1, 6000000L))
      graft.sync.SyncOps.applyChangeLog(o, log, Seq("o_orderkey"),
        "op", "ver", "o_orderkey").orderBy("o_orderkey")
    }),
    "q_scd2_history" -> ((s, d) =>
      // Type-2 SCD history: each user's event_type runs become
      // validity intervals — half-open, tiling, one open current row
      graft.sync.SyncOps.scd2(Tables.events(s, d), Seq("user_id"),
          Seq("event_type"), "ts", "event_id")
        .orderBy("user_id", "valid_from", "event_type")),
    "q_scd2_delta" -> ((s, d) => {
      // incremental dimension history: the standing history is built
      // from events before the cutoff; the strictly-later tail
      // arrives as a batch and merges without reprocessing the past.
      // The oracle is the ONE-SHOT q_scd2_history SQL — delta ==
      // one-shot is the contract, checked bit-for-bit.
      val ev = Tables.events(s, d)
      val cut = lit("2024-01-20 00:00:00").cast("timestamp")
      val history = graft.sync.SyncOps.scd2(
        ev.filter(col("ts") <= cut), Seq("user_id"), Seq("event_type"),
        "ts", "event_id")
      graft.sync.SyncOps.scd2Delta(history, ev.filter(col("ts") > cut),
          Seq("user_id"), Seq("event_type"), "ts", "event_id")
        .orderBy("user_id", "valid_from", "event_type")
    }),
    "d_sentences" -> ((s, d) => {
      // sentence segmentation: terminal punctuation planted at every
      // 7th word ('.') and 17th word ('!', which wins on overlap) by
      // an INDEXED transform both engines express; the lookbehind-
      // free sentence regex then replays in RE2
      val withPunct = Tables.documents(s, d).select(col("doc_id"), expr(
        """array_join(transform(split(text, ' '), (w, i) ->
          |  CASE WHEN (i + 1) % 17 = 0 THEN concat(w, '!')
          |       WHEN (i + 1) % 7 = 0 THEN concat(w, '.')
          |       ELSE w END), ' ')""".stripMargin).as("text"))
      graft.text.TextAnalysis.sentences(withPunct)
        .orderBy("doc_id", "sent_id")
    }),
    "d_embed_truncate" -> ((s, d) =>
      // Matryoshka truncation norm accounting: prefix norm, full
      // norm, retained fraction — pure array arithmetic, replayed
      // over DOUBLE-cast lists like the cosine oracles
      graft.sim.Similarity.truncateDims(Tables.embeddings(s, d), 16)
        .select("vec_id", "norm_full", "norm_trunc", "frac_norm")
        .orderBy("vec_id")),
    "d_unicode_normalize" -> ((s, d) => {
      // NFC normalization through the codegen'd kernel: docs not
      // divisible by 3 get a decomposed base+combining-mark pair
      // appended (à é ô ñ in decomposed form, chosen by id%4 — baked
      // as literals, see d_script_detect on Spark's chr()); the
      // oracle replays with DuckDB's nfc_normalize, putting the
      // normalized TEXT, both lengths, and the changed flag on the
      // hash path. UAX#15 NFC is engine-independent by spec.
      val tail = (0 until 4).map(i => "aeon".charAt(i).toString + (768 + i).toChar)
      val docs = Tables.documents(s, d)
        .withColumn("__t",
          element_at(array(tail.map(lit): _*), (col("doc_id") % 4 + 1).cast("int")))
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" x"), col("__t"))).as("text"))
      docs.select(col("doc_id"),
          length(col("text")).cast("long").as("raw_len"),
          graft.functions.Unicode.nfc(col("text")).as("text_nfc"))
        .withColumn("nfc_len", length(col("text_nfc")).cast("long"))
        .withColumn("changed", col("nfc_len") =!= col("raw_len"))
        .orderBy("doc_id")
    }),
    "d_split_assign" -> ((s, d) =>
      // portable train/val/test assignment (80/10/10): the split
      // label is pure md5-bucket arithmetic over the id, so the
      // oracle recomputes every label from the published spec alone
      graft.ops.Sampling.splitAssignPortable(
          Tables.documents(s, d), "doc_id", 0.8, 0.1)
        .select("doc_id", "lang", "split").orderBy("doc_id")),
    "d_split_leakage" -> ((s, d) => {
      // split-leakage audit over SQL-expressible near-dup pairs (the
      // d_dedup_clusters_sql edge recipe, one mutation level): doc k
      // pairs its first-3-words-dropped copy (id + 10000) iff exact
      // 3-gram jaccard >= 0.5; a pair LEAKS when the md5 split
      // arithmetic lands its endpoints in different splits. Labels
      // are recomputed from the pair ids — zero corpus joins.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val copies = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text")))
      val sh = copies.select(col("doc_id"),
        graft.functions.Hashes.gram_hashes(col("text"), 3).as("shingles"))
      val byBase = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id") % 10000).orderBy(col("doc_id"))
      val pairs = sh
        .withColumn("doc_a", lag(col("doc_id"), 1).over(byBase))
        .withColumn("sh_a", lag(col("shingles"), 1).over(byBase))
        .filter(col("doc_a").isNotNull &&
          size(array_intersect(col("sh_a"), col("shingles"))).cast("double") /
            size(array_union(col("sh_a"), col("shingles"))) >= 0.5)
        .select(col("doc_a"), col("doc_id").as("doc_b"))
      graft.ops.Sampling.splitLeakage(pairs, 0.8, 0.1)
        .orderBy("doc_a")
    }),
    "d_link_components" -> ((s, d) => {
      // disjoint per-source chains: consecutive docs within a source
      // link up (the last doc self-edges so singleton sources still
      // surface); every source collapses to ONE component whose
      // representative is its lexicographically smallest node string
      // — which the oracle computes directly with a window min.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val node = concat(col("source"), lit("/"), col("doc_id"))
      val nxt = coalesce(lead(col("doc_id"), 1).over(w), col("doc_id"))
      graft.ops.LinkGraph.components(
          docs.select(node.as("src"),
            concat(col("source"), lit("/"), nxt).as("dst")))
        .orderBy("n")
    }),
    "d_hits" -> ((s, d) => {
      // HITS over the ring-plus-hub graph: every source is both a
      // hub (links to its successor + hub.example) and a small
      // authority (one ring in-link); hub.example is a pure
      // authority (no out-links — hub score 0). 3 iterations, L1
      // normalization; the oracle unrolls the identical arithmetic.
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      graft.ops.LinkGraph.hits(ring.unionByName(toHub), iters = 3)
        .orderBy("n")
    }),
    "d_url_percent" -> ((s, d) => {
      // percent-encoding canonicalization end to end: every doc's url
      // carries unreserved escapes (%41->A, %61->a, %7e->~), a
      // reserved escape in lowercase hex (%2f -> %2F, kept), and a
      // malformed %g1 (literal) — normalize, then full canonicalize.
      // The oracle rebuilds the expected canonical url by plain string
      // construction from doc_id/source.
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val url = concat(lit("HTTPS://WWW.Ex%41mple-"), col("source"),
        lit(".COM:443/p%61th%2Fdoc/"), col("doc_id"),
        lit("?id=%2fv%7e&x=%g1"))
      docs.select(col("doc_id"),
        graft.ops.UrlOps.canonicalizeUrl(
          graft.ops.UrlOps.normalizePercentEncoding(url)).as("url"))
        .orderBy("doc_id")
    }),
    "d_robots_filter" -> ((s, d) => {
      // retroactive robots.txt compliance over a synthesized crawl:
      // four path shapes per doc (open / private / private-public /
      // pdf) against a policy exercising group selection (evilbot's
      // blanket ban must NOT apply), longest-match allow-override, and
      // the $-anchored wildcard; every 3rd source ships NO robots row
      // (allowed). The oracle rebuilds url + verdict from
      // doc_id/source arithmetic alone.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val path = when(col("doc_id") % 4 === 0, concat(lit("/doc/"), col("doc_id")))
        .when(col("doc_id") % 4 === 1, concat(lit("/private/"), col("doc_id")))
        .when(col("doc_id") % 4 === 2, concat(lit("/private/public/"), col("doc_id")))
        .otherwise(concat(lit("/files/"), col("doc_id"), lit(".pdf")))
      val url = concat(lit("https://"), col("source"), lit(".example.com"), path)
      val robots = docs.select("source").distinct()
        .filter(substring(col("source"), 4, 10).cast("int") % 3 =!= 0)
        .select(concat(col("source"), lit(".example.com")).as("host"),
          lit("User-agent: evilbot\nDisallow: /\n\nUser-agent: *\n" +
            "Disallow: /private/\nAllow: /private/public/\n" +
            "Disallow: /*.pdf$\n").as("robots_txt"))
      graft.ops.Robots.robotsVerdict(
          docs.withColumn("url", url), robots, "graftbot")
        .select("doc_id", "url", "allowed").orderBy("doc_id")
    }),
    "d_url_psl" -> ((s, d) => {
      // public-suffix list as DATA: six host shapes per doc exercise
      // longest-match (github.io over io, de.com over com, co.uk over
      // uk), the implicit `*` fallback for an unlisted tld, a
      // WILDCARD rule (*.ck — one label fills the star, one more
      // registers) and an EXCEPTION rule (!www.ck — the matching
      // labels ARE the registered domain, beating the wildcard). The
      // oracle rebuilds host + registered domain from doc_id/source
      // directly. Plan: broadcast joins only — the corpus never
      // shuffles.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val host = when(col("doc_id") % 6 === 0,
        concat(lit("pages.user-"), col("source"), lit(".github.io")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("shop."), col("source"), lit(".de.com")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("news.archive."), col("source"), lit(".co.uk")))
        .when(col("doc_id") % 6 === 3,
          concat(lit("x.y."), col("source"), lit(".test")))
        .when(col("doc_id") % 6 === 4,
          concat(lit("a.b."), col("source"), lit(".ck")))
        .otherwise(lit("deep.www.ck"))
      val psl = Seq("com", "uk", "co.uk", "de.com", "github.io", "io", "de",
        "*.ck", "!www.ck").toDF("suffix")
      graft.ops.UrlOps.registeredDomainWithPsl(
          docs.withColumn("host", host), psl)
        .select("doc_id", "host", "domain").orderBy("doc_id")
    }),
    "d_crawl_charset" -> ((s, d) => {
      // charset-aware ingestion: three page shapes per doc — Latin-1
      // declared in the HTTP Content-Type header, Shift-JIS declared
      // only in a <meta charset> tag, and an undeclared UTF-8 default
      // — each carrying a non-ASCII marker byte sequence (0xE9 /
      // 0x83 0x65 / 0xE2 0x9C 0x93) that MOJIBAKES under a blind
      // UTF-8 cast. The oracle rebuilds url, decoded text, and token
      // count from doc_id/text with chr() codepoints, so the per-row
      // charset detection AND the byte-exact decode are both on the
      // hash path.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      def ascii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        c.cast("binary")
      val p0 = concat(ascii(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n<p>"),
        col("text"), lit(" caf"))), unhex(lit("E9")), ascii(lit("</p>")))
      val p1 = concat(ascii(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<meta charset=\"shift_jis\"><p>"),
        col("text"), lit(" "))), unhex(lit("8365")), ascii(lit("</p>")))
      val p2 = concat(ascii(concat(
        lit("HTTP/1.1 200 OK\r\n\r\n<p>"), col("text"), lit(" "))),
        unhex(lit("E29C93")), ascii(lit("</p>")))
      val records = docs.select(
        lit("response").as("warc_type"),
        concat(lit("https://cs.example/doc/"), col("doc_id")).as("target_uri"),
        when(col("doc_id") % 3 === 0, p0)
          .when(col("doc_id") % 3 === 1, p1).otherwise(p2).as("payload"))
      graft.pipeline.Crawl.curate(records, Seq.empty[String].toDF("domain"),
          minChars = 1)
        .select("url", "text", "n_tokens").orderBy("url")
    }),
    "d_vocab_topk" -> ((s, d) =>
      TextAnalysis.vocabTopK(Tables.documents(s, d), 200)),
    "d_bpe_pair_counts" -> ((s, d) =>
      graft.text.Bpe.initialPairCounts(Tables.documents(s, d), 200)),
    "d_jsonl_roundtrip" -> ((s, d) => {
      // corpus interchange: export the documents table as JSONL, land
      // it back as typed parquet through the quarantine-splitting
      // reader — lossless by construction, so the oracle is a plain
      // projection of the source table
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
        .add("lang", org.apache.spark.sql.types.StringType)
      // applicationId in the path: two concurrent harness processes on
      // the same dataset must not overwrite each other's staging
      // (ADVICE r9), and a fresh session never reads a stale run's dump
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_" +
        s"${s.sparkContext.applicationId}_${d.hashCode.toHexString}"
      graft.sources.JsonlCorpus.writeJsonl(
        Tables.documents(s, d).select("doc_id", "text", "lang"),
        s"$base/jsonl", numFiles = 8, orderCol = "doc_id")
      graft.sources.JsonlCorpus.toParquet(s, s"$base/jsonl", s"$base/pq", schema)
      s.read.parquet(s"$base/pq").orderBy("doc_id")
    }),
    "d_warc_roundtrip" -> ((s, d) => {
      // crawl-format round-trip with NO file I/O in the timed path:
      // serialize every doc as a WARC resource record, concatenate
      // every 500 records into one multi-record blob (sorted by
      // doc_id — deterministic byte layout; blob count scales with
      // the corpus like real crawl archives), then walk the
      // blobs back with the pure-byte record parser and recover
      // (doc_id, text) from the WARC-Target-URI + payload. Lossless by
      // construction, so the oracle is a plain projection — any header
      // arithmetic or content-length advancement error breaks the hash
      import s.implicits._
      val recs = Tables.documents(s, d).select("doc_id", "text")
        .as[(Long, String)]
        .map { case (id, text) =>
          (id / 500, id, graft.sources.Warc.writeRecord(
            "resource", s"http://corpus.example/doc/$id", "text/plain",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      warcBlobs(recs)
        .flatMap { blob =>
          val p = graft.sources.Warc.parseRecords(blob)
          require(p.quarantinedAt == -1L,
            s"round-trip blob must parse cleanly, quarantined at ${p.quarantinedAt}")
          p.records.map(r => (r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong,
            new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("doc_id", "text")
        .orderBy("doc_id")
    }),
    "d_warc_split_read" -> ((s, d) => {
      // the intra-file-split WARC reader on the oracle hash path: the
      // timed work is the real thing — one compressed-byte member
      // scan with validated split points, then seek + bounded walk
      // per split across tasks. Lossless by construction (every
      // member is a resource record built from the corpus), so the
      // oracle is a plain projection; a missed/duplicated member or
      // a bad boundary breaks the hash.
      val dir = warcSplitFixture(s, d)
      graft.sources.Warc.readSplit(s, dir, targetSplitBytes = 256 * 1024)
        .filter(col("warc_type") === "resource")
        .select(substring_index(col("target_uri"), "/", -1).cast("long")
          .as("doc_id"),
          col("payload").cast("string").as("text"))
        .orderBy("doc_id")
    }),
    "d_compression_ratio" -> ((s, d) =>
      // deflate-ratio quality signal; rows-only — DuckDB has no
      // deflate, TextMmSpec pins semantics (repetition vs noise vs
      // prose ordering, partitioning bit-identity)
      TextAnalysis.compressionRatio(Tables.documents(s, d))
        .orderBy("doc_id")),
    "d_ccnet_buckets" -> ((s, d) =>
      // CCNet head/middle/tail partition over the corpus's own unigram
      // LM proxy — threshold-compare shape, no global sort
      TextAnalysis.perplexityBuckets(Tables.documents(s, d))),
    "d_bigram_logprob" -> ((s, d) =>
      TextAnalysis.bigramLogProb(Tables.spread(Tables.documents(s, d)))),
    "d_kneser_ney" -> ((s, d) =>
      // KenLM's own smoothing on the same shared pair stream:
      // absolute discounting + continuation-probability backoff
      TextAnalysis.kneserNeyLogProb(Tables.spread(Tables.documents(s, d)))),
    "d_kneser_ney3" -> ((s, d) =>
      // order-3 KN with recursive backoff (KenLM's standard order):
      // trigram discounting -> bigram continuation -> unigram
      // continuation, all counts from one trigram-type table
      TextAnalysis.kneserNeyTrigramLogProb(
        Tables.spread(Tables.documents(s, d)))),
    "d_scc" -> ((s, d) => {
      // strongly-connected components over a pairs-chained graph
      // built from the distinct sources: consecutive source pairs
      // (by lexicographic rank) form 2-cycles (the SCCs), chain
      // edges run from the LEX-LARGER pair down to the smaller one
      // (so every pair roots its own color class and all SCCs peel
      // in one round), and every source links to a dangling hub
      // (trimmed singleton). The oracle recomputes SCCs from the
      // transitive closure (recursive CTE) — mutual reachability,
      // min member as label.
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val nxt = srcs.select(col("source"),
        row_number().over(w).as("rn"),
        lead(col("source"), 1).over(w).as("nxt"))
      val pairFwd = nxt.filter(col("rn") % 2 === 1 && col("nxt").isNotNull)
        .select(col("source").as("src"), col("nxt").as("dst"))
      val pairBack = pairFwd.select(col("dst").as("src"), col("src").as("dst"))
      val chain = nxt.filter(col("rn") % 2 === 0 && col("nxt").isNotNull)
        .select(col("nxt").as("src"), col("source").as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      graft.ops.LinkGraph.stronglyConnectedComponents(
          pairFwd.unionByName(pairBack).unionByName(chain).unionByName(toHub))
        .orderBy("scc", "n")
    }),
    "d_graph_bowtie" -> ((s, d) => {
      // Broder bow-tie macro-map over a graph planting every class:
      // the 3 lexicographically-first sources form the CORE triangle,
      // every other source STARS directly into it (IN — a star, not a
      // chain, keeps trim depth and reach diameter at ~2 instead of
      // O(sources) rounds of pure job latency), a hub hangs off the
      // core (OUT), plus a tendril off IN, a tube IN->x->OUT
      // bypassing the core, and an isolated 2-cycle (DISCONNECTED,
      // and — at size 2 — also the tie the size-3 core must beat).
      // The oracle reclassifies from the recursive-CTE closure.
      import s.implicits._
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val wAll = org.apache.spark.sql.expressions.Window.orderBy("source")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val r = srcs.select(col("source"),
          row_number().over(w).as("rn"),
          lead(col("source"), 1).over(w).as("nxt"),
          first(col("source")).over(w).as("s1"))
        .withColumn("s3",
          max(when(col("rn") === 3, col("source"))).over(wAll))
      val tri = r.filter(col("rn").isin(1, 2) && col("nxt").isNotNull)
        .select(col("source").as("src"), col("nxt").as("dst"))
        .unionByName(r.filter(col("rn") === 3)
          .select(col("source").as("src"), col("s1").as("dst")))
      val star = r.filter(col("rn") >= 4)
        .select(col("source").as("src"), col("s3").as("dst"))
      val taps = r.filter(col("rn") === 1)
        .select(col("source").as("src"), lit("hub.example").as("dst"))
        .unionByName(r.filter(col("rn") === 5)
          .select(col("source").as("src"), lit("tendril.example").as("dst")))
        .unionByName(r.filter(col("rn") === 6)
          .select(col("source").as("src"), lit("tube.example").as("dst")))
      val lits = Seq(("tube.example", "hub.example"),
        ("iso1.example", "iso2.example"), ("iso2.example", "iso1.example"))
        .toDF("src", "dst")
      graft.ops.LinkGraph.bowTie(
          tri.unionByName(star).unionByName(taps).unionByName(lits))
        .orderBy("cls", "n")
    }),
    "d_graph_stats" -> ((s, d) => {
      // structural sanity panel over a ring+hub graph with every
      // even-length source's ring edge ALSO reversed — plants a known
      // reciprocated subset; the oracle recomputes each statistic
      // from the same edge construction
      val srcs = Tables.documents(s, d).select("source").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("source")
      val ring = srcs.select(col("source").as("src"),
        coalesce(lead(col("source"), 1).over(w),
          first(col("source")).over(w)).as("dst"))
      val toHub = srcs.select(col("source").as("src"),
        lit("hub.example").as("dst"))
      val rev = ring.filter(length(col("src")) % 2 === 0)
        .select(col("dst").as("src"), col("src").as("dst"))
      graft.ops.LinkGraph.stats(
        ring.unionByName(toHub).unionByName(rev))
    }),
    "d_bm25_search" -> ((s, d) => {
      // lexical retrieval-for-curation: the first 5 docs' 8-word
      // prefixes as queries over the whole corpus, top-10 per query
      // queries come from the PLAIN scan (a 5-row filter needs no
      // fan-out); only the corpus side spreads, keeping the spread
      // exchange at two consumers (token stream + length stats)
      val docs = Tables.spread(Tables.documents(s, d))
      val queries = Tables.documents(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(lower(col("text")), " "), 1, 8), " ")
            .as("query_text"))
      graft.text.Bm25.search(docs, queries, k = 10)
    }),
    "d_hybrid_search" -> ((s, d) => {
      // hybrid retrieval: BM25 over text fused with cosine over
      // embeddings by reciprocal-rank fusion — the first 3 docs are
      // the queries on both sides (their 8-word prefix lexically,
      // their aligned embedding semantically), 20 candidates fetched
      // per retriever, top-10 fused survive
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(lower(col("text")), " "), 1, 8), " ")
            .as("query_text"))
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      graft.text.HybridSearch.search(docs, emb, queries,
        emb.filter(col("vec_id") < 3), k = 10, fetchK = 20)
    }),
    "d_heavy_hitters" -> ((s, d) =>
      // bigram heavy hitters: Misra-Gries candidates + exact recount;
      // result is EXACT (spec pins equality with the full groupBy), so
      // the plain GROUP BY + HAVING oracle applies
      graft.ops.HeavyHitters.topNgrams(Tables.documents(s, d), 0.0015, 2)),
    "q_session_window" -> ((s, d) =>
      // NATIVE session_window operator (vs q_events_sessionize's
      // window-id formulation) — same sessions on any data without
      // exact-gap arrivals, which the oracle hash-check confirms
      graft.streaming.IncrementalStream.sessionWindowAgg(
        Tables.events(s, d), "user_id", "ts", "30 minutes")
        .orderBy("user_id", "session_start")),
    "q_interval_overlap" -> ((s, d) => {
      // concurrent-session analysis: distinct cross-user session pairs
      // whose [start, end) windows intersect — the bucketed interval
      // OVERLAP join (canonical-bucket dedup, no distinct exchange)
      val sess = Analytics.sessionize(s, d).select(col("user_id"),
        col("session_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
      val l = sess.toDF("ua", "sa", "ls", "le")
      val r = sess.toDF("ub", "sb", "rs", "re")
      graft.ops.RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        3600L * 1000000L)
        .filter(col("ua") < col("ub"))
        .select("ua", "sa", "ub", "sb")
        .orderBy("ua", "sa", "ub", "sb")
    }),
    "q_hist_quantiles" -> ((s, d) => {
      // mergeable histogram-quantile state read back as daily p50/p99;
      // the oracle recomputes the identical fixed-bin estimator in SQL
      val ev = Tables.events(s, d)
      graft.ops.IncrementalAgg.quantilesFromState(
        graft.ops.IncrementalAgg.histState(ev, "ts", "1 day", "value", 0.0, 1000.0, 200),
        0.0, 1000.0, Seq(0.5, 0.99))
    }),
    "d_tfidf_keywords" -> ((s, d) =>
      // top-3 bigram keywords per doc (31-word vocab makes unigram idf
      // degenerate; bigrams spread df). Ties break on term asc — fully
      // deterministic, so the window-rank oracle reproduces exactly
      graft.text.TfIdf.keywords(Tables.documents(s, d), 3, 2)),
    "q_range_join" -> ((s, d) => {
      // non-equi temporal join, bucketed: market-wide shipping activity
      // during each of the top-100 orders' 7-day windows. A bare
      // inequality join plans as a nested loop; the bucket equi-join
      // bounds comparisons per bucket. The range set is top-k-bounded
      // because point-in-range output scales as |points| x overlap
      // density — an all-orders window query is unbounded BY SEMANTICS
      // at any engine, not an operator limitation
      val li = Tables.lineitem(s, d)
        .select(expr("unix_date(CAST(l_shipdate AS DATE))").as("ship_d"),
          col("l_quantity"))
      val ord = Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(100)
        .select(col("o_orderkey"),
          expr("unix_date(CAST(o_orderdate AS DATE))").as("start_d"),
          expr("unix_date(CAST(o_orderdate AS DATE)) + 7").as("end_d"))
      graft.ops.RangeJoin.rangeAgg(li, ord, "ship_d", "start_d", "end_d", 7L,
        "o_orderkey",
        Seq(count(lit(1)).as("n_ship"), sum("l_quantity").as("qty")))
        .orderBy("o_orderkey")
    }),
    "d_sample_portable" -> ((s, d) =>
      // md5-bucket deterministic sample — the portable variant exists
      // precisely so an external engine can recompute membership; the
      // oracle does exactly that
      graft.ops.Sampling.deterministicSamplePortable(
        Tables.documents(s, d), "doc_id", 0.25)
        .select("doc_id", "source", "lang").orderBy("doc_id")),
    "d_sample_k_per_group" -> ((s, d) =>
      graft.ops.Sampling.sampleKPerGroup(
        Tables.documents(s, d), "lang", "doc_id", 40)
        .select("doc_id", "lang", "source").orderBy("doc_id")),
    "d_shard_report" -> ((s, d) =>
      // training-shard balance audit: portable md5 assignment into 8
      // shards + per-shard token totals — any engine recomputes both
      // the membership and the totals
      graft.ops.Sharding.shardReport(Tables.documents(s, d), 8)),
    "d_dsir_select" -> ((s, d) => {
      // DSIR importance resampling: select the 100 raw-pool docs most
      // like the src0 target domain. Exact-word form of the paper's
      // hashed-ngram estimator — the log-ratio model is SQL-
      // reproducible, so the oracle recomputes the identical ranking
      val docs = Tables.documents(s, d)
      graft.pipeline.Dsir.selectTopK(
        target = docs.filter(col("source") === "src0"),
        raw = Tables.spread(docs.filter(col("source") =!= "src0")),
        k = 100)
    }),
    "d_domain_overlap" -> ((s, d) =>
      // cross-source 3-gram overlap matrix: which sources share enough
      // content that cross-source dedup must precede mixing. Gram
      // hashes in the engine, gram strings in the oracle — distinct
      // counts agree modulo 64-bit collisions (none at this sf)
      graft.text.TextAnalysis.domainOverlap(Tables.documents(s, d), 3)),
    "d_quality_classifier" -> ((s, d) => {
      // fastText-style learned quality filter: 5 rounds of distributed
      // logistic descent over hashed unigram+bigram features, then
      // score the corpus and roll up calibration per true label. The
      // testdata's metadata columns are uncorrelated with text (every
      // lang shares one 31-word vocab), so — like d_c4_clean's
      // boilerplate and d_dedup_embed_lsh's injected dups — the entry
      // plants deterministic signal: docs with doc_id % 3 == 0 carry a
      // marker phrase the model must discover. rows-only: iterative
      // optimization isn't SQL-expressible; ClassifierSpec pins the
      // exact semantics against a sequential plain-JVM reference.
      val docs = Tables.documents(s, d)
        .withColumn("label", (col("doc_id") % 3 === 0).cast("int"))
        .withColumn("text", when(col("label") === 1,
          concat(col("text"), lit(" verified curated corpus")))
          .otherwise(col("text")))
      // raw presence features (l1Normalize=false): classic bag-of-words
      // LR conditioning — decisive separation in 5 full-batch passes
      // 3 epochs (was 5), bias initialized at the class-prior log-odds:
      // zero-init descent spends its first epochs absorbing the class
      // imbalance into the bias AND every common-feature weight (3
      // zero-init epochs end all-negative), while prior-init spends all
      // 3 on separation. lr = 0.5 sits well inside the decisive band
      // (measured 0.5-0.55 verdict-perfect; >= 0.6 starts flipping
      // negatives) — label-0/1 mean_prob 0.35/0.73, verdicts 0/333 and
      // 167/167, at 3/5 of the 5-epoch schedule's training cost
      // class-prior bias from ONE tiny agg action (two separate
      // count() actions here meant two extra scans of the transformed
      // docs inside the timed entry — ADVICE r11)
      val byLabel = docs.groupBy("label").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val m = graft.pipeline.TextClassifier.train(
        docs, docs.select("doc_id", "label"),
        dim = 1 << 15, iters = 3, lr = 0.5, l1Normalize = false,
        biasInit = math.log(byLabel(1).toDouble / byLabel(0).toDouble))
      graft.pipeline.TextClassifier.score(docs, m)
        .join(docs.select("doc_id", "label"), "doc_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("prob").cast("decimal(30,12)")).cast("double") /
            count(lit(1)), 6).as("mean_prob"),
          count(when(col("prob") >= 0.5, 1)).as("n_pred_pos"))
        .orderBy("label")
    }),
    "d_lang_id_learned" -> ((s, d) => {
      // LEARNED language ID — the CCNet production gate (fastText
      // langid = softmax over hashed grams) layered on the heuristic:
      // the testdata's lang column is uncorrelated with its one
      // shared vocab, so the entry plants per-language marker phrases
      // (the d_quality_classifier convention), weak-labels every doc
      // with the HEURISTIC langId, trains the softmax gate on those
      // weak labels, and rolls up agreement + calibration per
      // heuristic language. rows-only (iterative descent);
      // ClassifierSpec pins exact softmax semantics vs a plain-JVM
      // sequential reference
      val langs = Seq("de", "en", "es", "fr", "zh")
      val docs = Tables.documents(s, d)
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
      // raw presence features (the d_quality_classifier conditioning
      // rationale): the planted markers carry count-8 evidence, so a
      // few full-batch passes separate decisively. sampleMax = 1000:
      // the 100 TB learned-gate contract — TRAIN on a bounded
      // hash-deterministic sample (covers the whole sf0.01 verify
      // corpus, so the dump is unchanged; 1/5 of sf0.1), SCORE the
      // full corpus
      val m = graft.pipeline.TextClassifier.trainSoftmax(
        docs, labels, dim = 1 << 15, nClasses = langs.size,
        iters = 8, lr = 1.0, l1Normalize = false, sampleMax = 1000)
      graft.pipeline.TextClassifier.scoreSoftmax(docs, m)
        .join(labels, "doc_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("cls") === col("label"), 1)).as("n_agree"),
          round(sum(col("prob").cast("decimal(30,12)")).cast("double") /
            count(lit(1)), 6).as("mean_prob"))
        .select(element_at(langArr, col("label") + 1).as("weak_lang"),
          col("n_docs"), col("n_agree"), col("mean_prob"))
        .orderBy("weak_lang")
    }),
    "d_ann_quantized" -> ((s, d) =>
      // int8-packed brute-force top-k: quantization, integer dots, and
      // the cosine normalization are all deterministic, so the DuckDB
      // oracle recomputes the identical ranking
      Similarity.cosineTopKQuantized(
        Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 10), 10)),
    "d_ann_pq" -> ((s, d) => {
      // IVF-PQ: trained coarse router + RESIDUAL-trained per-subspace
      // PQ codebooks (FAISS by_residual — the production IVFADC
      // form), search over the (id, cell, 8-byte code) index with
      // per-query ADC luts + the coarse dot term. Rows-only (float
      // k-means class, the d_ann_ivf contract); PqSpec pins kernel
      // exactness + residual>=raw precision vs brute
      val emb = Tables.embeddings(s, d)
      val coarse = graft.sim.Ivf.train(emb, 8, 2)
      val cb = graft.sim.Pq.trainResidual(emb, coarse, m = 8, k = 16,
        iters = 2)
      graft.sim.Pq.annPq(emb, emb.filter(col("vec_id") < 10), 3,
        coarse, cb, nprobe = 2)
    }),
    "d_pq_encode" -> ((s, d) => {
      // PQ ENCODE on the hash path, RESIDUAL form: frozen exact-double
      // coarse centroids route by argmax dot (ties to the lowest id),
      // the residual v - coarse[cid] feeds the frozen codebook's
      // per-subspace argmin-L2 (cnorm - 2*dot, ties to the lowest
      // id) — every step replayable; codes surface as hex (K=4 ->
      // digit pairs, so case never enters)
      val nv = Tables.embeddings(s, d)
        .select(col("vec_id"),
          graft.functions.VectorOps.l2normalize(
            transform(col("embedding"), _.cast("double"))).as("nv"))
        .withColumn("cid", graft.functions.CentroidOps.nearestCentroid(
          col("nv"), SparkEntry.pqCoarseFrozen))
      nv.select(col("vec_id"), col("cid"),
          hex(graft.functions.PqOps.pqEncode(
            graft.functions.CentroidOps.centroidResidual(
              col("nv"), col("cid"), SparkEntry.pqCoarseFrozen),
            SparkEntry.pqFrozen)).as("code_hex"))
        .orderBy("vec_id")
    }),
    "d_embed_quantize" -> ((s, d) =>
      // the harness sorts result columns with pandas, which cannot sort
      // array cells — emit the int8 vector as an md5 digest (still
      // bit-for-bit: any component change alters the digest). The library
      // API (Similarity.quantizeInt8) keeps the real array column.
      Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("scale"),
          md5(expr("array_join(transform(qvec, x -> CAST(x AS STRING)), ',')"))
            .as("qvec_digest"))),
    "d_c4_clean" -> ((s, d) => {
      // multi-line docs with deterministic punctuation (even lines end
      // '.'), plus injected lorem-ipsum / curly-brace boilerplate in
      // some docs — the C4 rules must keep exactly the even clean lines
      val lined = Tables.spread(Tables.documents(s, d)).select(col("doc_id"), concat(
        when(col("doc_id") % 7 === 0, lit("lorem ipsum dolor sit amet.\n")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("function() { var x = 1; }.\n")).otherwise(lit("")),
        expr("array_join(transform(sequence(1, CAST(ceil(size(split(text, ' ')) / 5.0) AS INT)), " +
          "g -> concat(array_join(slice(split(text, ' '), (g - 1) * 5 + 1, 5), ' '), " +
          "IF(g % 2 = 0, '.', ''))), '\n')")).as("text"))
      TextAnalysis.c4Clean(lined)
    }),
    "d_dedup_lines" -> ((s, d) => {
      // the corpus is single-line word salad, so build multi-line docs
      // deterministically (a shared banner + 5-word lines) and strip
      // lines appearing in > 10 docs; the oracle mirrors the build
      // regroup_words is byte-identical to the transform/array_join
      // formulation the DuckDB oracle mirrors (spec-pinned) — the
      // interpreted lambda ran once per dedupLines consumer
      val lined = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("ACCEPT COOKIES\n"),
          graft.functions.Hashes.regroup_words(col("text"), 5)).as("text"))
      Dedup.dedupLines(lined, 10)
    }),
    "d_dedup_lines_within" -> ((s, d) => {
      // build multi-line docs (8-word lines) and append each doc's
      // FIRST line again — the repeated-boilerplate shape the
      // within-doc pass removes; the oracle mirrors the build
      val lined = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.Hashes.regroup_words(col("text"), 8).as("t2"))
        .select(col("doc_id"),
          concat(col("t2"), lit("\n"),
            expr("element_at(split(t2, '\n'), 1)")).as("text"))
      graft.text.TextAnalysis.dedupLinesWithinDoc(lined)
    }),
    "d_chunk_docs" -> ((s, d) =>
      // sliding-window context chunks: 20-token windows, 5-token overlap
      graft.text.TextAnalysis.chunkDocs(
        Tables.documents(s, d).select("doc_id", "text"), 20, 5)
        .orderBy("doc_id", "chunk_id")),
    "d_dedup_spans" -> ((s, d) =>
      // exact substring dedup (Lee et al. ExactSubstr): 3-token spans
      // occurring in >= 2 docs are removed everywhere but the min-id
      // keeper; the small-vocabulary corpus has heavy natural overlap
      Dedup.dedupSpans(Tables.documents(s, d).select("doc_id", "text"), 3)),
    "d_domain_mix" -> ((s, d) =>
      // rebalance three source domains to a 2:1:1 target mixture; the
      // id-hash keep decision is Spark-side xxhash64 (no DuckDB
      // equivalent) → rows-only here, exact semantics in SamplingSpec
      graft.ops.Sampling.mixDomains(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .select("doc_id", "source").orderBy("doc_id")),
    "d_domain_mix_portable" -> ((s, d) =>
      // same 2:1:1 rebalance with the md5 bucket: counts, max-retention
      // fractions, and membership are all recomputed by the oracle SQL
      graft.ops.Sampling.mixDomainsPortable(
        Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .select("doc_id", "source").orderBy("doc_id")),
    "d_domain_mix_temp" -> ((s, d) => {
      // temperature-scaled mixing end to end (XLM-R/mT5 recipe):
      // weights = p^alpha renormalized over the corpus's OWN counts,
      // then the portable max-retention mix. Weights round to 12 dp on
      // both engines — pow() may differ in the last ulp across libms,
      // and the bucket threshold must not sit on that ulp. The oracle
      // recomputes the whole chain: counts -> pow -> name-ordered
      // z-fold -> fractions -> md5 membership -> per-domain kept
      // counts.
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = graft.ops.Sampling.temperatureWeights(counts, alpha = 0.5)
        .map { case (dn, x) => dn ->
          BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }
      graft.ops.Sampling.mixDomainsPortable(docs, "source", "doc_id", w,
        salt = "temp")
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    }),
    "m_multimodal_meta" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.mediaTable(Tables.documents(s, d)))
        .toDF().orderBy("doc_id")),
    "m_resize" -> ((s, d) =>
      Multimodal.resizePlan(
        Multimodal.mediaTable(Tables.documents(s, d)), 128, 96)),
    "m_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleOffsets(
        Multimodal.mediaTable(Tables.documents(s, d)))
        .select("doc_id", "duration_ms", "n_frames").orderBy("doc_id")),
    "m_audio_energy" -> ((s, d) =>
      Multimodal.audioFrameEnergy(
        Multimodal.mediaTable(Tables.documents(s, d)))),
    "d_audio_clipping" -> ((s, d) => {
      // clipping stats over stub PCM: each doc's payload plants a
      // run of code-point-254 "pinned" samples (length id % 9)
      // between two copies of the text, so peak, clip count, and
      // the fold-based RMS all replay from ascii() arithmetic
      import s.implicits._
      val media = Tables.documents(s, d).select("doc_id", "text")
        .as[(Long, String)].map { case (id, t) =>
          Multimodal.MediaRow(id, "audio",
            (t + ("þ" * (id % 9).toInt) + t).getBytes("UTF-8"), 0, 0, 0)
        }
      Multimodal.audioClipping(media, clipLevel = 250).orderBy("doc_id")
    }),
    "d_vad_segments" -> ((s, d) => {
      // voice-activity segmentation over the stub-PCM frame-energy
      // stream: each doc's payload is text + a 64-sample run of
      // chr(1) "silence" + text, so at threshold 50 the energy dips
      // exactly where the silence run lands and the active frames
      // island into segments. The oracle replays the frame RMS math
      // AND the gaps-and-islands window arithmetic.
      import s.implicits._
      val media = Tables.documents(s, d).select("doc_id", "text")
        .as[(Long, String)].map { case (id, t) =>
          Multimodal.MediaRow(id, "audio",
            (t + ("\u0001" * 64) + t).getBytes("UTF-8"), 0, 0, 0)
        }
      Multimodal.vadSegments(Multimodal.audioFrameEnergy(media),
          threshold = 50.0)
        .orderBy("doc_id", "seg_id")
    }),
    "d_shot_detect" -> ((s, d) => {
      // shot-boundary detection over REALLY-decoded frames: each doc
      // encodes a 4-frame GIF with grays [g, g+5, 200, 205]
      // (g = id % 100), so the only luma jumps >= 50 are the start
      // and frame 2 — two shots per doc. The oracle replays the
      // lag/threshold window from doc_id arithmetic; the engine's
      // lumas come from decoded GIF rasters.
      import s.implicits._
      val media = mediaIds(s, d)
        .map { id =>
          val g = (id % 100).toInt
          Multimodal.MediaRow(id, "video",
            Multimodal.grayGif(Seq(g, g + 5, 200, 205), 4, 3), 0, 0, 0)
        }
      Multimodal.shotBoundaries(
          Multimodal.frameSampleDecoded(media, step = 1).toDF(),
          threshold = 50.0)
        .orderBy("doc_id", "frame_idx")
    }),
    "m_frame_sample_decoded" -> ((s, d) => {
      // REAL frame extraction round-trip: encode a deterministic
      // 2-frame animated GIF per doc (frame grays g = id % 256 and
      // 255 - g, explicit palette so nothing quantizes), then decode
      // every frame back through the multi-frame reader. The oracle
      // reconstructs per-frame pixel facts (dims + exact mean luma)
      // from doc_id alone — a decoder that trusted metadata or
      // misread any frame's raster breaks the hash.
      import s.implicits._
      val media = mediaIds(s, d)
        .map { id =>
          val g = (id % 256).toInt
          Multimodal.MediaRow(id, "video",
            Multimodal.grayGif(Seq(g, 255 - g),
              (4 + id % 4).toInt, (3 + id % 3).toInt), 0, 0, 0)
        }
      Multimodal.frameSampleDecoded(media, step = 1)
        .toDF().orderBy("doc_id", "frame_idx")
    }),
    "m_image_dhash" -> ((s, d) => {
      // perceptual hash over REALLY-decoded images: each doc encodes
      // a 9x8 per-pixel GIF with g(x,y) = (id*37 + y*9 + x*13) % 256,
      // so the thumbnail grid-sample is the identity and every dHash
      // bit is derivable from arithmetic. The engine's bits come from
      // decoded rasters; the oracle rebuilds the 16-hex string
      // nibble by nibble.
      import s.implicits._
      val media = mediaIds(s, d)
        .map { id =>
          val grays = for (y <- 0 until 8; x <- 0 until 9)
            yield ((id * 37 + y * 9 + x * 13) % 256).toInt
          Multimodal.MediaRow(id, "image",
            Multimodal.grayPixelGif(grays, 9, 8), 0, 0, 0)
        }
      Multimodal.dhash(media).toDF()
        .select("doc_id", "width", "height", "dhash").orderBy("doc_id")
    }),
    "m_image_dedup" -> ((s, d) => {
      // image near-dup pairs by dHash hamming <= 3: grays are md5-
      // derived per (doc, pixel) — pseudorandom, so unrelated docs
      // sit ~32 bits apart and the recovered pairs are exactly the
      // planted perturbed copies (id + 10000, +101 gray at pixel
      // (0,4) — flips at most the two comparisons that pixel
      // touches). Band join + exact XOR-popcount verification; the
      // oracle rebuilds every gray from the same md5 and replays
      // banding AND verification.
      import s.implicits._
      val media = mediaIds(s, d)
        .flatMap { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def gray(p: Int, pert: Boolean): Int = {
            val h = md.digest(s"$id:$p".getBytes("UTF-8"))
            (((h(0) & 0xff) + (if (pert && p == 4) 101 else 0)) % 256)
          }
          def grays(pert: Boolean) =
            (0 until 72).map(gray(_, pert))
          Seq(
            Multimodal.MediaRow(id, "image",
              Multimodal.grayPixelGif(grays(pert = false), 9, 8), 0, 0, 0),
            Multimodal.MediaRow(id + 10000, "image",
              Multimodal.grayPixelGif(grays(pert = true), 9, 8), 0, 0, 0))
        }
      Multimodal.dhashPairs(Multimodal.dhash(media).toDF(), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "m_image_dedup_delta" -> ((s, d) => {
      // incremental image ingest: the base corpus is a standing
      // dhash INDEX (hashed once, payloads never re-decoded); the
      // batch is every image's perturbed copy. With md5-pseudorandom
      // grays the one-shot pair set is exactly the cross pairs
      // (base×base and batch×batch find nothing), so the delta
      // result hash-matches the same oracle as m_image_dedup.
      import s.implicits._
      def media(pert: Boolean) = mediaIds(s, d)
        .map { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def gray(p: Int): Int = {
            val h = md.digest(s"$id:$p".getBytes("UTF-8"))
            (((h(0) & 0xff) + (if (pert && p == 4) 101 else 0)) % 256)
          }
          Multimodal.MediaRow(id + (if (pert) 10000 else 0), "image",
            Multimodal.grayPixelGif((0 until 72).map(gray), 9, 8), 0, 0, 0)
        }
      val index = Multimodal.dhash(media(pert = false)).toDF()
      Multimodal.dhashPairsDelta(index,
          Multimodal.dhash(media(pert = true)).toDF(), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "m_audio_dedup" -> ((s, d) => {
      // audio near-dup pairs by fingerprint hamming <= 3 over REALLY-
      // decoded WAVs: each doc is 512 md5-derived u8 samples (16 per
      // digest — pseudorandom, so unrelated clips sit ~32 bits
      // apart); its planted copy (id + 10000) is the same clip
      // re-leveled to 90% ((u*9)/10 — the classic re-encode
      // transform the sign-delta bits are built to survive; integer
      // rounding flips only near-tie band comparisons). Band join +
      // exact XOR-popcount verification; the oracle rebuilds every
      // sample from the same md5 and replays the lag-difference
      // energies, banding AND verification.
      import s.implicits._
      val media = mediaIds(s, d)
        .flatMap { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val base = (0 until 32).flatMap(blk =>
            md.digest(s"$id:$blk".getBytes("UTF-8")).map(_ & 0xff).toSeq)
          Seq(
            Multimodal.MediaRow(id, "audio",
              Multimodal.pcmWavU8(base), 0, 0, 0),
            Multimodal.MediaRow(id + 10000, "audio",
              Multimodal.pcmWavU8(base.map(u => u * 9 / 10)), 0, 0, 0))
        }
      Multimodal.audioNearDups(media, maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "m_audio_dedup_delta" -> ((s, d) => {
      // incremental audio ingest: the base corpus is a standing
      // fingerprint INDEX (decoded once, payloads never re-read);
      // the batch is every clip's re-leveled copy. With md5-
      // pseudorandom samples the one-shot pair set is exactly the
      // cross pairs (base x base and batch x batch find nothing), so
      // the delta result hash-matches the same oracle as
      // m_audio_dedup.
      import s.implicits._
      def media(pert: Boolean) = mediaIds(s, d)
        .map { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val base = (0 until 32).flatMap(blk =>
            md.digest(s"$id:$blk".getBytes("UTF-8")).map(_ & 0xff).toSeq)
          Multimodal.MediaRow(id + (if (pert) 10000 else 0), "audio",
            Multimodal.pcmWavU8(
              if (pert) base.map(u => u * 9 / 10) else base), 0, 0, 0)
        }
      val index = Multimodal.audioFingerprint(media(pert = false)).toDF()
      Multimodal.audioNearDupsDelta(index,
          Multimodal.audioFingerprint(media(pert = true)).toDF(),
          maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "m_video_dedup" -> ((s, d) => {
      // video near-dup by frame-hash sets: each doc is a 4-frame
      // per-pixel GIF (md5 grays keyed by (id, frame, pixel)); its
      // re-edit copy (id + 10000) keeps frames 2-3 and swaps in two
      // fresh frames — shared 2 of union 6, jaccard 0.333333. The
      // engine must decode every frame, hash the rasters, bucket on
      // the 8-byte hashes, and verify exact set jaccard; the oracle
      // predicts the whole output from the planted structure.
      import s.implicits._
      val media = mediaIds(s, d)
        .flatMap { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def frame(key: String): Seq[Int] = (0 until 72).map { p =>
            md.digest(s"$key:$p".getBytes("UTF-8"))(0) & 0xff
          }
          val base = (0 until 4).map(f => frame(s"$id:$f"))
          val mut = Seq(base(2), base(3),
            frame(s"${id + 10000}:2"), frame(s"${id + 10000}:3"))
          Seq(
            Multimodal.MediaRow(id, "video",
              Multimodal.grayPixelGifFrames(base, 9, 8), 0, 0, 0),
            Multimodal.MediaRow(id + 10000, "video",
              Multimodal.grayPixelGifFrames(mut, 9, 8), 0, 0, 0))
        }
      Multimodal.videoNearDups(media, threshold = 0.3)
        .orderBy("doc_a", "doc_b")
    }),
    "q_lttb_downsample" -> ((s, d) =>
      // the range-partitioned (no single-partition stage) variant;
      // spec pins it equal to the window-indexed form. Project down to
      // the plotted columns BEFORE the operator — it returns every
      // input column, so pruning can't happen inside it, and carrying
      // the unused props map through sort+cache is pure waste
      graft.ops.Lttb.downsampleRangePartitioned(
        Tables.events(s, d).withColumn("ts_d", unix_micros(col("ts")).cast("double"))
          .select("event_id", "ts", "value", "ts_d"),
        "ts_d", "value", 500, Seq("event_id"))
        .select("event_id", "ts", "value")),
    "q_lttb_exact" -> ((s, d) =>
      // reference-exact sequential LTTB, one kernel run per event_type
      // series (spec pins index-exact equality vs the reference algo)
      graft.ops.Lttb.downsampleExact(
        Tables.events(s, d).withColumn("ts_d", unix_micros(col("ts")).cast("double")),
        "ts_d", "value", 200, Seq("event_type"))
        .select("event_type", "ts", "value").orderBy("event_type", "ts")),
  )

  // Shared by m_audio_dedup and m_audio_dedup_delta (delta == one-shot
  // for md5-pseudorandom clips): rebuild all 512 u8 samples per clip
  // from the same md5 blocks the engine encoded into WAV (byte j of
  // digest(id ':' blk) = hex pair j of DuckDB's md5 string), apply the
  // 90% re-level to the perturbed copy ((u*9)//10 — non-negative, so
  // floor == Java's trunc), replay the lag-difference band energies
  // over 16 frames of 32 (signed-vs-unsigned cancels in differences),
  // the 128 sign-delta bits MSB-first, then the engine's own
  // pigeonhole scheme: 4 bands of 8 hex chars for candidates, exact
  // bit-diff count as verification.
  private val audioDedupOracle: String =
    """WITH ids AS (
      |  SELECT doc_id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, 1 FROM documents
      |), smp AS (
      |  SELECT i.doc_id, t.s,
      |    CASE WHEN i.pert = 1 THEN
      |      (CAST(('0x' || substring(md5(CAST(i.doc_id - 10000 AS VARCHAR) || ':' || CAST(t.s // 16 AS VARCHAR)), CAST((t.s % 16) * 2 + 1 AS INT), 2)) AS BIGINT) * 9) // 10
      |    ELSE
      |      CAST(('0x' || substring(md5(CAST(i.doc_id AS VARCHAR) || ':' || CAST(t.s // 16 AS VARCHAR)), CAST((t.s % 16) * 2 + 1 AS INT), 2)) AS BIGINT)
      |    END AS u
      |  FROM ids i CROSS JOIN range(512) t(s)
      |), eng AS (
      |  SELECT a.doc_id, a.s // 32 AS f, r.b AS band,
      |    sum((b.u - a.u) * (b.u - a.u)) AS e
      |  FROM smp a CROSS JOIN range(9) r(b)
      |  JOIN smp b ON b.doc_id = a.doc_id AND b.s = a.s + r.b + 1
      |    AND b.s // 32 = a.s // 32
      |  GROUP BY a.doc_id, a.s // 32, r.b
      |), bits AS (
      |  SELECT a.doc_id, a.f * 8 + a.band AS bi,
      |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM eng a JOIN eng b ON b.doc_id = a.doc_id AND b.f = a.f
      |    AND b.band = a.band + 1
      |), nib AS (
      |  SELECT doc_id, bi // 4 AS ni,
      |    sum(bit * CASE bi % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END) AS v
      |  FROM bits GROUP BY doc_id, bi // 4
      |), hex AS (
      |  SELECT doc_id,
      |    string_agg(substring('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY ni) AS fp
      |  FROM nib GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, b AS band_idx, substring(fp, CAST(b*8 + 1 AS INT), 8) AS band
      |  FROM hex, range(4) r(b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
      |), ham AS (
      |  SELECT c.doc_a, c.doc_b,
      |    sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hamming
      |  FROM cand c
      |  JOIN bits ba ON ba.doc_id = c.doc_a
      |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.bi = ba.bi
      |  GROUP BY c.doc_a, c.doc_b
      |)
      |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM ham
      |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // Parallel LTTB (avg-anchor variant): buckets and anchors are
    // selection-independent, so the whole downsample is windows + one
    // per-bucket argmax — mirrors Lttb.core exactly (endpoints are the
    // singleton buckets -1 / lastBucket+1; ties keep the smallest index)
    "q_lttb_downsample" ->
      """WITH pts AS (
        |  SELECT event_id, ts, value,
        |    CAST(epoch_us(ts) AS DOUBLE) AS x, CAST(value AS DOUBLE) AS y,
        |    CAST(row_number() OVER (ORDER BY CAST(epoch_us(ts) AS DOUBLE), event_id) - 1 AS BIGINT) AS i,
        |    count(*) OVER () AS n
        |  FROM events),
        |bucketed AS (
        |  SELECT *, CASE WHEN i = 0 THEN -1
        |                 WHEN i = n - 1 THEN 498
        |                 ELSE LEAST(CAST(floor((i - 1) / ((n - 2) / 498.0)) AS BIGINT), 497) END AS b
        |  FROM pts),
        |cent AS (
        |  SELECT b, avg(x) AS ax, avg(y) AS ay FROM bucketed GROUP BY b),
        |anch AS (
        |  SELECT b,
        |    lag(ax) OVER (ORDER BY b) AS px, lag(ay) OVER (ORDER BY b) AS py,
        |    lead(ax) OVER (ORDER BY b) AS nx, lead(ay) OVER (ORDER BY b) AS ny
        |  FROM cent),
        |ranked AS (
        |  SELECT t.event_id, t.ts, t.value, t.i,
        |    row_number() OVER (PARTITION BY t.b ORDER BY
        |      coalesce(abs((a.px - a.nx) * (t.y - a.py) - (a.px - t.x) * (a.ny - a.py)), 0) DESC,
        |      t.i ASC) AS rn
        |  FROM bucketed t JOIN anch a USING (b))
        |SELECT event_id, ts, value FROM ranked WHERE rn = 1 ORDER BY i""".stripMargin,
    // Reference-exact sequential LTTB: the left anchor is the previously
    // SELECTED point, so selection is a fold — one recursive-CTE step per
    // interior bucket, carrying (prev index, prev x, prev y); next-bucket
    // average anchors are selection-independent and precomputed. Mirrors
    // Lttb.lttbIndices (data/lttb.py:89-150) including the first-max tie
    // and the empty-next-bucket fallback
    "q_lttb_exact" ->
      """WITH RECURSIVE pts AS (
        |  SELECT event_type, ts, value,
        |    CAST(epoch_us(ts) AS DOUBLE) AS x,
        |    CAST(value AS DOUBLE) AS y,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) - 1 AS BIGINT) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |buckets AS (
        |  SELECT p.event_type, p.n, g.i AS b,
        |    CAST(floor((g.i - 1) * (p.n - 2) / 198.0) AS BIGINT) + 1 AS bstart,
        |    LEAST(CAST(floor(g.i * (p.n - 2) / 198.0) AS BIGINT) + 1, p.n) AS bend,
        |    CAST(floor(g.i * (p.n - 2) / 198.0) AS BIGINT) + 1 AS nstart,
        |    LEAST(CAST(floor((g.i + 1) * (p.n - 2) / 198.0) AS BIGINT) + 1, p.n) AS nend
        |  FROM (SELECT DISTINCT event_type, n FROM pts WHERE n > 200) p,
        |       (SELECT unnest(generate_series(1, 198)) AS i) g),
        |anchors AS (
        |  SELECT b.event_type, b.b, b.bstart, b.bend,
        |    CASE WHEN b.nend > b.nstart
        |      THEN (SELECT avg(p.x) FROM pts p WHERE p.event_type = b.event_type AND p.i >= b.nstart AND p.i < b.nend)
        |      ELSE (SELECT p.x FROM pts p WHERE p.event_type = b.event_type AND p.i = LEAST(b.nstart, b.n - 1))
        |    END AS ax,
        |    CASE WHEN b.nend > b.nstart
        |      THEN (SELECT avg(p.y) FROM pts p WHERE p.event_type = b.event_type AND p.i >= b.nstart AND p.i < b.nend)
        |      ELSE (SELECT p.y FROM pts p WHERE p.event_type = b.event_type AND p.i = LEAST(b.nstart, b.n - 1))
        |    END AS ay
        |  FROM buckets b),
        |sel AS (
        |  SELECT p.event_type, p.i AS sel_i, p.x AS px, p.y AS py, CAST(0 AS BIGINT) AS step
        |  FROM pts p WHERE p.n > 200 AND p.i = 0
        |  UNION ALL
        |  SELECT s.event_type, nxt.i, nxt.x, nxt.y, s.step + 1
        |  FROM sel s
        |  JOIN anchors a ON a.event_type = s.event_type AND a.b = s.step + 1,
        |  LATERAL (
        |    SELECT p.i, p.x, p.y,
        |      abs((s.px - a.ax) * (p.y - s.py) - (s.px - p.x) * (a.ay - s.py)) AS area
        |    FROM pts p
        |    WHERE p.event_type = s.event_type AND p.i >= a.bstart AND p.i < a.bend
        |    ORDER BY area DESC, p.i ASC LIMIT 1) nxt
        |  WHERE s.step < 198)
        |SELECT p.event_type, p.ts, p.value
        |FROM pts p
        |WHERE p.n <= 200
        |   OR p.i = 0 OR p.i = p.n - 1
        |   OR EXISTS (SELECT 1 FROM sel s WHERE s.event_type = p.event_type AND s.sel_i = p.i AND s.step > 0)
        |ORDER BY p.event_type, p.ts""".stripMargin,
    // Greedy first-fit packing is a fold over id order within each block —
    // one recursive step per rank, carrying (bin, used); mirrors
    // Curation.packSequences' aggregate() lambda exactly
    "d_pack_sequences" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, doc_id // 100 AS block,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
        |         row_number() OVER (PARTITION BY doc_id // 100 ORDER BY doc_id) AS rk
        |  FROM documents),
        |pack AS (
        |  SELECT block, rk, doc_id, tok, CAST(0 AS BIGINT) AS bin, tok AS used
        |  FROM toks WHERE rk = 1
        |  UNION ALL
        |  SELECT t.block, t.rk, t.doc_id, t.tok,
        |    CASE WHEN p.used + t.tok > 512 AND p.used > 0 THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.used + t.tok > 512 AND p.used > 0 THEN t.tok ELSE p.used + t.tok END
        |  FROM pack p JOIN toks t ON t.block = p.block AND t.rk = p.rk + 1)
        |SELECT doc_id, tok AS n_tokens, block * 4294967296 + bin AS bin_id
        |FROM pack ORDER BY doc_id""".stripMargin,
    // Polynomial rolling hash (base 1000003, wrapping mod 2^64, FNV
    // offset seed) over ASCII text — HUGEINT modular arithmetic folds
    // byte-for-byte identically to the codegen'd kernel, then reinterprets
    // the unsigned result as a signed 64-bit value
    "d_fingerprint_rolling" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp_rolling
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(1469598103934665603::HUGEINT,
        |        list_transform(range(1, len(text) + 1), i -> CAST(ascii(text[i]) AS HUGEINT))),
        |      (acc, b) -> (acc * 1000003 + b) % 18446744073709551616::HUGEINT) AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // Winnowing: per-GRAM polynomial hashes (same HUGEINT fold,
    // reinterpreted signed BEFORE the window min so both engines use
    // the same total order), window-min selection with rightmost tie,
    // "lpad(pos):hash" strings so plain string sort/distinct give the
    // canonical position order, md5 digest of the joined selection
    "d_winnowing" ->
      """WITH g AS (
        |  SELECT doc_id, list_transform(range(1, greatest(len(w) - 2, 1) + 1),
        |           i -> array_to_string(w[i : i + 2], ' ')) AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |hu AS (
        |  SELECT doc_id, len(grams) AS n_grams, list_transform(grams, gg ->
        |    list_reduce(
        |      list_prepend(1469598103934665603::HUGEINT,
        |        list_transform(range(1, len(gg) + 1), ii -> CAST(ascii(gg[ii]) AS HUGEINT))),
        |      (acc, b) -> (acc * 1000003 + b) % 18446744073709551616::HUGEINT)) AS hsu
        |  FROM g),
        |h AS (
        |  SELECT doc_id, n_grams, list_transform(hsu, x ->
        |    CAST(CASE WHEN x >= 9223372036854775808::HUGEINT
        |              THEN x - 18446744073709551616::HUGEINT ELSE x END AS BIGINT)) AS hs
        |  FROM hu),
        |s AS (
        |  SELECT doc_id, n_grams,
        |    list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1), j ->
        |      lpad(CAST(list_max(list_transform(range(j, least(j + 4, len(hs))), i ->
        |             CASE WHEN hs[i + 1] = list_aggregate(hs[j + 1 : j + 4], 'min')
        |                  THEN i ELSE -1 END)) AS VARCHAR), 8, '0')
        |      || ':' ||
        |      CAST(list_aggregate(hs[j + 1 : j + 4], 'min') AS VARCHAR))) AS sel
        |  FROM h)
        |SELECT doc_id, n_grams, len(sel) AS n_fp,
        |  md5(array_to_string(list_sort(sel), ',')) AS fp_digest
        |FROM s ORDER BY doc_id""".stripMargin,
    // Same per-gram hash + window-min selection over the shifted-copy
    // corpus; the oracle pairs via a plain fingerprint self-join (the
    // library expands per-hash combinations instead — same result)
    "d_winnowing_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |         array_to_string((string_split(text, ' '))[3:], ' ')
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, greatest(len(w) - 2, 1) + 1),
        |           i -> array_to_string(w[i : i + 2], ' ')) AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)),
        |hu AS (
        |  SELECT doc_id, list_transform(grams, gg ->
        |    list_reduce(
        |      list_prepend(1469598103934665603::HUGEINT,
        |        list_transform(range(1, len(gg) + 1), ii -> CAST(ascii(gg[ii]) AS HUGEINT))),
        |      (acc, b) -> (acc * 1000003 + b) % 18446744073709551616::HUGEINT)) AS hsu
        |  FROM g),
        |h AS (
        |  SELECT doc_id, list_transform(hsu, x ->
        |    CAST(CASE WHEN x >= 9223372036854775808::HUGEINT
        |              THEN x - 18446744073709551616::HUGEINT ELSE x END AS BIGINT)) AS hs
        |  FROM hu),
        |fp AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
        |      j -> list_aggregate(hs[j + 1 : j + 4], 'min')))) AS h
        |  FROM h),
        |ok AS (SELECT h FROM fp GROUP BY h HAVING count(*) BETWEEN 2 AND 100)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
        |JOIN ok ON ok.h = a.h
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,
    "d_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS token
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT token, count(*) AS cnt
        |FROM toks, tot GROUP BY token, n
        |HAVING count(*) > 0.0015 * n
        |ORDER BY cnt DESC, token""".stripMargin,
    "q_session_window" ->
      """SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events) s) g
        |GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,
    "q_interval_overlap" ->
      """WITH sess AS (
        |  SELECT user_id, session_id,
        |    epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
        |  FROM (
        |    SELECT user_id, ts,
        |      CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |             THEN 1 ELSE 0 END AS new_session
        |      FROM events) s) g
        |  GROUP BY user_id, session_id)
        |SELECT a.user_id AS ua, a.session_id AS sa, b.user_id AS ub, b.session_id AS sb
        |FROM sess a JOIN sess b
        |  ON a.s_us < b.e_us AND b.s_us < a.e_us AND a.user_id < b.user_id
        |ORDER BY ua, sa, ub, sb""".stripMargin,
    "q_hist_quantiles" ->
      """WITH binned AS (
        |  SELECT date_trunc('day', ts) AS bucket_ts,
        |    least(199, greatest(0, CAST(floor(CAST(value AS DOUBLE) / 1000.0 * 200) AS INT))) AS bin
        |  FROM events),
        |counts AS (SELECT bucket_ts, bin, count(*) AS c FROM binned GROUP BY 1, 2),
        |tot AS (SELECT bucket_ts, sum(c) AS n FROM counts GROUP BY 1),
        |cum AS (
        |  SELECT bucket_ts, bin, sum(c) OVER (PARTITION BY bucket_ts ORDER BY bin) AS cumc
        |  FROM counts),
        |sel AS (
        |  SELECT c.bucket_ts,
        |    min(CASE WHEN cumc >= ceil(0.5 * n) THEN bin END) AS b50,
        |    min(CASE WHEN cumc >= ceil(0.99 * n) THEN bin END) AS b99
        |  FROM cum c JOIN tot USING (bucket_ts) GROUP BY 1)
        |SELECT bucket_ts,
        |  (b50 + 1) * 1000.0 / 200 AS q_50,
        |  (b99 + 1) * 1000.0 / 200 AS q_99
        |FROM sel ORDER BY bucket_ts""".stripMargin,
    "d_tfidf_keywords" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM terms),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * round(ln((nd.n + 1.0) / (dfx.df + 1.0)) + 1.0, 9), 6) AS score
        |  FROM tf JOIN dfx USING (term), nd),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "q_range_join" ->
      """WITH top_orders AS (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
        |SELECT o_orderkey, count(*) AS n_ship, sum(l_quantity) AS qty
        |FROM top_orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "d_sample_portable" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE CAST(('0x' || substring(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 250000
        |ORDER BY doc_id""".stripMargin,
    "d_sample_k_per_group" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY CAST(('0x' || substring(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT),
        |             doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 40 ORDER BY doc_id""".stripMargin,
    "d_shard_report" ->
      // same md5 bucket recipe as d_sample_portable, mod 8; whitespace
      // token count mirrors the packSequences/tokenCounts convention
      """SELECT shard, count(*) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS sum_tokens,
        |  min(t) AS min_tokens, max(t) AS max_tokens
        |FROM (
        |  SELECT CAST(CAST(('0x' || substring(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 % 8 AS INT) AS shard,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS t
        |  FROM documents) x
        |GROUP BY shard ORDER BY shard""".stripMargin,
    "d_domain_overlap" ->
      // gram construction mirrors the d_ngram_jaccard oracle (k=3:
      // max(len-3,0)+1 grams, short docs contribute their whole text);
      // counts are over distinct gram STRINGS where the engine counts
      // distinct 64-bit gram hashes — equal absent collisions
      """WITH g AS (
        |  SELECT DISTINCT source, gram FROM (
        |    SELECT source, unnest(list_transform(
        |      range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS gram
        |    FROM documents) t),
        |tot AS (SELECT source, count(*) AS n FROM g GROUP BY source)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  any_value(ta.n) AS grams_a, any_value(tb.n) AS grams_b,
        |  count(*) AS shared,
        |  round(CAST(count(*) AS DOUBLE) /
        |        (any_value(ta.n) + any_value(tb.n) - count(*)), 6) AS jaccard
        |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |JOIN tot ta ON ta.source = a.source
        |JOIN tot tb ON tb.source = b.source
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "d_dsir_select" ->
      // identical op order to Dsir.logRatioModel/importanceWeights:
      // (c+λ)/(T+λV) ratios divided, ln rounded 9dp, exact decimal sum,
      // final round 6dp — ulp-safe by the repo determinism contract
      """WITH tgt AS (SELECT text FROM documents WHERE source = 'src0'),
        |rawp AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |ct AS (SELECT w, count(*) AS c_t FROM (
        |         SELECT unnest(string_split(text, ' ')) AS w FROM tgt)
        |       WHERE length(w) > 0 GROUP BY w),
        |cq AS (SELECT w, count(*) AS c_q FROM (
        |         SELECT unnest(string_split(text, ' ')) AS w FROM rawp)
        |       WHERE length(w) > 0 GROUP BY w),
        |vocab AS (SELECT coalesce(ct.w, cq.w) AS w,
        |                 coalesce(c_t, 0) AS c_t, coalesce(c_q, 0) AS c_q
        |          FROM ct FULL OUTER JOIN cq ON ct.w = cq.w),
        |tot AS (SELECT CAST(sum(c_t) AS DOUBLE) AS t_t,
        |               CAST(sum(c_q) AS DOUBLE) AS t_q,
        |               CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |model AS (SELECT w, CAST(round(ln(
        |            ((CAST(c_t AS DOUBLE) + 1.0) / (t_t + 1.0 * v)) /
        |            ((CAST(c_q AS DOUBLE) + 1.0) / (t_q + 1.0 * v))), 9)
        |          AS DECIMAL(30,12)) AS logratio
        |          FROM vocab CROSS JOIN tot),
        |toks AS (SELECT doc_id, w FROM (
        |           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM rawp)
        |         WHERE length(w) > 0),
        |scored AS (SELECT doc_id, count(logratio) AS n_tokens,
        |                  sum(logratio) AS sum_lr
        |           FROM toks LEFT JOIN model USING (w) GROUP BY doc_id)
        |SELECT r.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |       round(CAST(coalesce(sum_lr, 0) AS DOUBLE), 6) AS log_weight
        |FROM rawp r LEFT JOIN scored ON r.doc_id = scored.doc_id
        |ORDER BY log_weight DESC, r.doc_id ASC LIMIT 100""".stripMargin,
    "d_domain_mix_portable" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY source
        |), w(source, wt) AS (
        |  VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |         ('src1', CAST(0.25 AS DOUBLE)),
        |         ('src2', CAST(0.25 AS DOUBLE))
        |), tot AS (
        |  SELECT min(n / wt) AS total FROM counts JOIN w USING (source)
        |), fr AS (
        |  SELECT w.source,
        |         CASE WHEN wt * total / n >= 1.0 - 1e-9 THEN CAST(1.0 AS DOUBLE)
        |              ELSE wt * total / n END AS f
        |  FROM counts JOIN w ON counts.source = w.source CROSS JOIN tot
        |)
        |SELECT d.doc_id, d.source FROM documents d
        |JOIN fr ON d.source = fr.source
        |WHERE CAST(('0x' || substring(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000
        |      < CAST(floor(f * 1000000) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    "d_domain_mix_temp" ->
      // full temperature-mix chain recomputed: integer-valued count
      // sums are exact in double (no order issue); the z normalizer
      // folds in SOURCE-NAME order via list_sum to mirror the engine's
      // sorted fold; weights round 12dp (pow ulp absorption) before
      // the identical-op-order fraction arithmetic and md5 membership
      """WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source),
        |tot AS (SELECT sum(n) AS t FROM c),
        |raw AS (SELECT source, n, pow(n / t, 0.5) AS r FROM c CROSS JOIN tot),
        |z AS (SELECT list_sum(list(r ORDER BY source)) AS zz FROM raw),
        |w AS (SELECT source, n, round(r / zz, 12) AS wt FROM raw CROSS JOIN z),
        |ts AS (SELECT min(n / wt) AS total FROM w),
        |fr AS (SELECT source,
        |         CASE WHEN wt * total / n >= 1.0 - 1e-9 THEN CAST(1.0 AS DOUBLE)
        |              ELSE wt * total / n END AS f
        |       FROM w CROSS JOIN ts)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
        |FROM documents d JOIN fr ON d.source = fr.source
        |WHERE CAST(('0x' || substring(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000
        |      < CAST(floor(f * 1000000) AS BIGINT)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_full_sync" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "q_incremental_sync" ->
      "SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00' ORDER BY ts, event_id",
    "q_upsert_keep_latest" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events e) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_dedup_keys" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events e) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_merge_partitioned" ->
      """WITH base AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'),
        |updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         TIMESTAMP '2002-01-01 00:00:00' AS o_orderdate,
        |         'UPDATED' AS o_orderpriority
        |  FROM base
        |  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00' AND o_orderkey % 97 = 0),
        |fresh AS (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  UNION ALL SELECT * FROM updates),
        |merged AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM fresh) u)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM merged WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q_merge_incremental" ->
      """SELECT * FROM (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        |  UNION ALL
        |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00') t
        |ORDER BY ts, event_id""".stripMargin,
    "q_time_bucket_agg" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_ts, COUNT(*) AS point_count,
        |  CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS value_avg,
        |  MIN(value) AS value_min, MAX(value) AS value_max
        |FROM events GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    "q_time_bucket_strptime" ->
      """SELECT time_bucket(INTERVAL '1 hour', strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S')) AS bucket_ts,
        |  COUNT(*) AS point_count,
        |  CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS value_avg,
        |  MIN(value) AS value_min, MAX(value) AS value_max
        |FROM events GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    "q_time_fill" ->
      """WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS value_avg
        |  FROM events WHERE value > 150 GROUP BY 1, 2),
        |axis AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_ts), max(bucket_ts), INTERVAL '1 hour')) AS bucket_ts
        |  FROM b GROUP BY event_type),
        |j AS (
        |  SELECT a.event_type, a.bucket_ts,
        |    coalesce(b.n_events, 0) AS n_events, b.value_avg
        |  FROM axis a LEFT JOIN b USING (event_type, bucket_ts))
        |SELECT event_type, bucket_ts, n_events,
        |  last_value(value_avg IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY bucket_ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_avg
        |FROM j ORDER BY event_type, bucket_ts""".stripMargin,
    "q_table_stats" ->
      """SELECT COUNT(*) AS row_count,
        |  MIN(l_quantity) AS l_quantity_min, MAX(l_quantity) AS l_quantity_max, CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE) / COUNT(l_quantity) AS l_quantity_avg,
        |  MIN(l_extendedprice) AS l_extendedprice_min, MAX(l_extendedprice) AS l_extendedprice_max, CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,12))) AS DOUBLE) / COUNT(l_extendedprice) AS l_extendedprice_avg,
        |  MIN(l_discount) AS l_discount_min, MAX(l_discount) AS l_discount_max, CAST(SUM(CAST(l_discount AS DECIMAL(30,12))) AS DOUBLE) / COUNT(l_discount) AS l_discount_avg,
        |  MIN(l_tax) AS l_tax_min, MAX(l_tax) AS l_tax_max, CAST(SUM(CAST(l_tax AS DECIMAL(30,12))) AS DOUBLE) / COUNT(l_tax) AS l_tax_avg
        |FROM lineitem""".stripMargin,
    "q_row_counts" ->
      Tables.all.sorted.map(t =>
        s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY table_name"),
    "q_select_limit" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey LIMIT 100",
    "q_histogram" ->
      // the CASE mirrors TableStats.histogram's hi == lo special case
      // (single bin-0 row) so a degenerate column can't 0/0 the oracle
      """WITH b AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem)
        |SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20)) AS INT), 19) AS INT) END AS bin,
        |  COUNT(*) AS n
        |FROM lineitem, b WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_length_histogram" ->
      // identical floor-bin arithmetic to the q_histogram oracle over
      // the derived whitespace-token count
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok
        |  FROM documents),
        |b AS (SELECT MIN(tok) AS lo, MAX(tok) AS hi FROM t)
        |SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(CAST(FLOOR((tok - lo) / ((hi - lo) / CAST(16 AS DOUBLE))) AS INT), 15) AS INT) END AS bin,
        |  COUNT(*) AS n
        |FROM t, b WHERE tok IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_type_inference" ->
      """SELECT event_type, CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS k_avg, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_filter_range" ->
      "SELECT * FROM lineitem WHERE l_extendedprice BETWEEN 1000 AND 5000 ORDER BY l_orderkey, l_linenumber",
    "q_schema_map" ->
      """SELECT column_name, source_type,
        |  CASE WHEN source_type LIKE '%NUMBER%' THEN 'DOUBLE'
        |       WHEN source_type LIKE '%VARCHAR%' OR source_type LIKE '%CHAR%' THEN 'STRING'
        |       WHEN source_type LIKE '%DATE%' THEN 'TIMESTAMP'
        |       WHEN source_type LIKE '%TIMESTAMP%' THEN 'TIMESTAMP'
        |       ELSE 'STRING' END AS engine_type
        |FROM (VALUES ('amount','NUMBER(10,2)'), ('event_time','DATE'), ('flag','CHAR(1)'),
        |             ('id','NUMBER'), ('name','VARCHAR2(100)'), ('note','CLOB'),
        |             ('updated_at','TIMESTAMP(6)')) t(column_name, source_type)
        |ORDER BY column_name""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_dim" ->
      """SELECT n_name, round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_multi_join" ->
      """SELECT n_name, round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-06-30' AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT c_nationkey, rank_in_nation, c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_nationkey,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rank_in_nation,
        |    c_custkey, c_name, c_acctbal
        |  FROM customer) t
        |WHERE rank_in_nation <= 3 ORDER BY c_nationkey, rank_in_nation""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_moving" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 6) AS avg_7d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS segment, COUNT(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS segment, COUNT(*) AS n FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) t
        |ORDER BY segment""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |  round(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(30,12))) AS DOUBLE), 2) AS finished_value
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_sync_reconcile" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    md5(concat_ws(chr(1),
        |      coalesce(CAST(o_orderstatus AS VARCHAR), chr(2)),
        |      coalesce(CAST(o_orderpriority AS VARCHAR), chr(2)),
        |      coalesce(CAST(o_custkey AS VARCHAR), chr(2)))) AS h
        |  FROM orders),
        |tgt_rows AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 37 = 0 THEN 'DRIFTED' ELSE o_orderpriority END AS o_orderpriority,
        |    o_custkey
        |  FROM orders WHERE o_orderkey % 31 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 5000000, o_orderstatus, o_orderpriority, o_custkey
        |  FROM orders WHERE o_orderkey % 41 = 0),
        |tgt AS (
        |  SELECT o_orderkey,
        |    md5(concat_ws(chr(1),
        |      coalesce(CAST(o_orderstatus AS VARCHAR), chr(2)),
        |      coalesce(CAST(o_orderpriority AS VARCHAR), chr(2)),
        |      coalesce(CAST(o_custkey AS VARCHAR), chr(2)))) AS h
        |  FROM tgt_rows)
        |SELECT coalesce(src.o_orderkey, tgt.o_orderkey) AS o_orderkey,
        |  CASE WHEN src.h IS NULL THEN 'missing_in_source'
        |       WHEN tgt.h IS NULL THEN 'missing_in_target'
        |       WHEN src.h <> tgt.h THEN 'changed' END AS status
        |FROM src FULL OUTER JOIN tgt ON src.o_orderkey = tgt.o_orderkey
        |WHERE (src.h IS NULL OR tgt.h IS NULL OR src.h <> tgt.h)
        |ORDER BY o_orderkey, status""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,12))) AS DOUBLE), 2) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, sum_qty""".stripMargin,
    "q_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |     b AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT * FROM (
        |  SELECT 'both_years' AS segment, COUNT(*) AS n FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b) t1
        |  UNION ALL
        |  SELECT 'only_1996' AS segment, COUNT(*) AS n FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b) t2
        |  UNION ALL
        |  SELECT 'either_year' AS segment, COUNT(*) AS n FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b) t3) u
        |ORDER BY segment""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 18 ORDER BY o_custkey""".stripMargin,
    "q_null_handling" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos,
        |  CAST(c_acctbal IS NULL AS INT) AS bal_was_null
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin,
    "q_date_parts" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        |  COUNT(*) AS n_orders,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,12))) AS DOUBLE), 2) AS revenue
        |FROM orders GROUP BY 1, 2, 3 ORDER BY y, q, m""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  concat_ws('|', c_name, c_mktsegment) AS name_seg
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, ts, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_asof_join_merge" ->
      """SELECT event_id, ts, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_events_sessionize" ->
      """SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events) s) g
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // Greedy earliest-completion per step == "exists an ordered
    // subsequence": the earliest completion of a prefix is achieved by
    // taking the earliest qualifying event at every step
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step""".stripMargin,
    // week_offset counts days from the user's own cohort date
    // (floor(days/7)) — no calendar-week truncation, so both engines
    // compute identical integer arithmetic
    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_date FROM ud GROUP BY 1),
        |wk AS (SELECT DISTINCT ud.user_id, c.cohort_date,
        |         CAST(floor((ud.d - c.cohort_date) / 7.0) AS INT) AS week_offset
        |       FROM ud JOIN c ON ud.user_id = c.user_id)
        |SELECT cohort_date, week_offset, count(*) AS users
        |FROM wk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,
    "d_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 2),
        |    i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS shingles
        |  FROM documents)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_id_a""".stripMargin,
    "d_dedup_embed" ->
      """SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cs
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) a
        |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
        |    ON a.vec_id < b.vec_id) t
        |WHERE cs >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    "d_dedup_minhash_portable" ->
      // the WHOLE MinHash+LSH pipeline recomputed: md5-mod-2^31
      // shingle hashes, the (2i+1)h + b_i mod 2^31-1 signature
      // family (every product < 2^38 — exact in BIGINT), decimal
      // band strings, pigeonhole candidates, exact-jaccard verify
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, array_to_string((string_split(text, ' '))[4:], ' ') FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS g
        |  FROM corpus
        |), hs AS (
        |  SELECT doc_id, list_distinct(list_transform(g,
        |    s -> CAST(CAST(('0x' || substring(md5(s), 1, 15)) AS UBIGINT) % 2147483648 AS BIGINT))) AS h
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 32), i ->
        |    list_min(list_transform(h, v ->
        |      ((2*i + 1) * v + (i * 2654435761) % 2147483647) % 2147483647))) AS s
        |  FROM hs
        |), bands AS (
        |  SELECT doc_id, b, array_to_string(s[b*4 + 1 : b*4 + 4], '-') AS bv
        |  FROM sig, range(0, 8) r(b)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |), ver AS (
        |  SELECT c.doc_a, c.doc_b,
        |    round(CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE) /
        |          len(list_distinct(list_concat(ha.h, hb.h))), 6) AS jaccard
        |  FROM cand c
        |  JOIN hs ha ON ha.doc_id = c.doc_a
        |  JOIN hs hb ON hb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, jaccard FROM ver
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "d_dedup_containment" ->
      // candidates (shared low-df shingle, self-join form), then both
      // containment directions over the full distinct hash sets; the
      // df cap gates candidates only
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000, array_to_string((string_split(text, ' '))[1:12], ' ') FROM documents
        |), hs AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |    i -> CAST(CAST(('0x' || substring(md5(array_to_string((string_split(text, ' '))[i:i+2], ' ')), 1, 15)) AS UBIGINT) % 2147483648 AS BIGINT))) AS h
        |  FROM corpus
        |), inv AS (
        |  SELECT doc_id, unnest(h) AS v FROM hs
        |), ok AS (
        |  SELECT v FROM inv GROUP BY v HAVING count(*) BETWEEN 2 AND 20
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN ok ON a.v = ok.v
        |  JOIN inv b ON a.v = b.v AND a.doc_id < b.doc_id
        |), ver AS (
        |  SELECT doc_a, doc_b,
        |    round(CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE) / len(ha.h), 6) AS c_a_in_b,
        |    round(CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE) / len(hb.h), 6) AS c_b_in_a
        |  FROM cand
        |  JOIN hs ha ON ha.doc_id = cand.doc_a
        |  JOIN hs hb ON hb.doc_id = cand.doc_b
        |)
        |SELECT doc_a, doc_b, c_a_in_b, c_b_in_a FROM ver
        |WHERE greatest(c_a_in_b, c_b_in_a) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d_dedup_clusters_sql" ->
      """WITH RECURSIVE copies AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, array_to_string((string_split(text, ' '))[4:], ' ') FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000, array_to_string((string_split(text, ' '))[7:], ' ') FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000, array_to_string((string_split(text, ' '))[10:], ' ') FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingles
        |  FROM copies
        |), chain AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 10000
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        |), edges AS (
        |  SELECT src, dst FROM chain UNION SELECT dst, src FROM chain
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |)
        |SELECT CAST(src AS BIGINT) AS id, CAST(least(src, MIN(dst)) AS BIGINT) AS comp
        |FROM reach GROUP BY src ORDER BY id""".stripMargin,
    "d_dedup_keep_best" ->
      // same chain construction as d_dedup_clusters_sql but with the
      // level→id mapping inverted (full text = largest id); survivors
      // = per-component argmax(length, tie min id), plus every
      // unlinked doc
      """WITH RECURSIVE copies AS (
        |  SELECT doc_id + 30000 AS doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000, array_to_string((string_split(text, ' '))[4:], ' ') FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, array_to_string((string_split(text, ' '))[7:], ' ') FROM documents
        |  UNION ALL
        |  SELECT doc_id, array_to_string((string_split(text, ' '))[10:], ' ') FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingles
        |  FROM copies
        |), chain AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 10000
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        |), edges AS (
        |  SELECT src, dst FROM chain UNION SELECT dst, src FROM chain
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), comp AS (
        |  SELECT src AS id, least(src, MIN(dst)) AS comp FROM reach GROUP BY src
        |), m AS (
        |  SELECT c.doc_id, length(c.text) AS len,
        |         coalesce(comp.comp, c.doc_id) AS comp
        |  FROM copies c LEFT JOIN comp ON comp.id = c.doc_id)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(len AS BIGINT) AS text_len FROM (
        |  SELECT doc_id, len,
        |         row_number() OVER (PARTITION BY comp ORDER BY len DESC, doc_id) AS rn
        |  FROM m) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "d_decontaminate_semantic" ->
      // identical op order to Similarity.semanticDecontaminate: raw
      // double cosine, round 6dp, then argmax with min-eval-id ties
      """WITH ev AS (
        |  SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id >= 20
        |  UNION ALL
        |  SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT c.vec_id, e.eval_id,
        |    round(list_dot_product(c.v, e.v) /
        |      (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
        |  FROM corpus c CROSS JOIN ev e)
        |SELECT vec_id, eval_id, cos_sim FROM (
        |  SELECT vec_id, eval_id, cos_sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, eval_id) AS rn
        |  FROM scored WHERE cos_sim >= 0.95) t
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "d_dedup_embed_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cs
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id) t
        |WHERE cs >= 0.95 ORDER BY vec_a, vec_b""".stripMargin,
    "q_skew_profile" ->
      """SELECT user_id, n_rows, round(n_rows / CAST((SELECT COUNT(*) FROM events) AS DOUBLE), 6) AS share
        |FROM (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id) t
        |ORDER BY n_rows DESC, CAST(user_id AS VARCHAR) LIMIT 20""".stripMargin,
    "d_cosine_topk" ->
      """SELECT query_id, rank, neighbor_id, cos_sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) DESC,
        |      c.vec_id) AS INT) AS rank,
        |    round(list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) c
        |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 10) q
        |    ON c.vec_id != q.vec_id) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "d_ann_filtered" ->
      // the d_cosine_topk replay with the attribute pre-filter: the
      // corpus side semi-joins the en-language doc ids before scoring
      """SELECT query_id, rank, neighbor_id, cos_sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) DESC,
        |      c.vec_id) AS INT) AS rank,
        |    round(list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |        WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')) c
        |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 10) q
        |    ON c.vec_id != q.vec_id) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "d_corpus_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
        |  COUNT(DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_unique_fp,
        |  CAST(SUM(CAST(q AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS quality_avg
        |FROM (
        |  SELECT lang, text,
        |    round(least(1.0, len(string_split(text, ' ')) / 100) *
        |      (1 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)), 6) AS q
        |  FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "d_lang_id" ->
      """SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM (
        |  SELECT doc_id, lang,
        |    (length(text) - length(replace(text, ' the ', ''))) / 5 + (length(text) - length(replace(text, ' and ', ''))) / 5 AS s_en,
        |    (length(text) - length(replace(text, ' der ', ''))) / 5 + (length(text) - length(replace(text, ' und ', ''))) / 5 AS s_de,
        |    (length(text) - length(replace(text, ' el ', ''))) / 4 + (length(text) - length(replace(text, ' los ', ''))) / 5 AS s_es,
        |    (length(text) - length(replace(text, ' le ', ''))) / 4 + (length(text) - length(replace(text, ' les ', ''))) / 5 AS s_fr,
        |    (length(text) - length(replace(text, '的', ''))) / 1 + (length(text) - length(replace(text, '是', ''))) / 1 AS s_zh
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "d_quality_score" ->
      """SELECT doc_id, CAST(n_words AS INT) AS n_words,
        |  round(punct / len, 6) AS punct_ratio,
        |  round(stop / n_words, 6) AS stopword_ratio,
        |  round(least(1.0, n_words / 100) * (1 - punct / len), 6) AS quality
        |FROM (
        |  SELECT doc_id, length(text) AS len,
        |    len(string_split(text, ' ')) AS n_words,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct,
        |    CAST((length(text) - length(replace(text, ' the ', ''))) / 5 + (length(text) - length(replace(text, ' a ', ''))) / 3 AS DOUBLE) AS stop
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "d_token_count" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_repetition" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  round(1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS dup_word_frac,
        |  CAST(greatest(len(string_split(text, ' ')) - 3, 0) + 1 AS INT) AS n_grams,
        |  round(1.0 - CAST(len(list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS DOUBLE)
        |    / (greatest(len(string_split(text, ' ')) - 3, 0) + 1), 6) AS dup_3gram_frac
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.0.'
        |         || CAST(doc_id % 256 AS VARCHAR) || '.7',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_decontaminate" ->
      """WITH eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        |corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 20
        |  UNION ALL
        |  SELECT doc_id + 20000 AS doc_id, text FROM eval_docs WHERE doc_id % 5 = 0),
        |eg AS (
        |  SELECT DISTINCT array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
        |  FROM (SELECT string_split(text, ' ') AS ws FROM eval_docs) w,
        |       LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 1))) AS i) t),
        |cg AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus) w,
        |       LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 1))) AS i) t)
        |SELECT cg.doc_id, count(*) AS n_contaminated_grams
        |FROM cg JOIN eg USING (gram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_bm25_search" ->
      """WITH q AS (
        |  SELECT doc_id AS query_id,
        |    array_to_string(list_slice(string_split(lower(text), ' '), 1, 8), ' ') AS query_text
        |  FROM documents WHERE doc_id < 5),
        |qt AS (
        |  SELECT DISTINCT query_id, t.term
        |  FROM q, LATERAL unnest(string_split(lower(query_text), ' ')) AS t(term)),
        |base AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(len(ws)) AS DOUBLE) AS total_len FROM base),
        |tok AS (
        |  SELECT doc_id, len(ws) AS doclen, t.term
        |  FROM base, LATERAL unnest(ws) AS t(term)),
        |tf AS (
        |  SELECT doc_id, doclen, term, count(*) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(round(
        |      round(ln((n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9) *
        |      (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
        |        (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(doclen AS DOUBLE) / (total_len / n)))),
        |      9) AS DECIMAL(30,12)) AS c
        |  FROM tf JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN stats),
        |scored AS (
        |  SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
        |  FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "d_hybrid_search" ->
      // lexical leg mirrors the d_bm25_search oracle (queries = first
      // 3 docs, rank <= 20); semantic leg mirrors d_cosine_topk
      // (self excluded, rank <= 20); RRF contributions follow the repo
      // decimal contract (9dp round -> exact sum -> 6dp)
      """WITH q AS (
        |  SELECT doc_id AS query_id,
        |    array_to_string(list_slice(string_split(lower(text), ' '), 1, 8), ' ') AS query_text
        |  FROM documents WHERE doc_id < 3),
        |qt AS (
        |  SELECT DISTINCT query_id, t.term
        |  FROM q, LATERAL unnest(string_split(lower(query_text), ' ')) AS t(term)),
        |base AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(len(ws)) AS DOUBLE) AS total_len FROM base),
        |tok AS (
        |  SELECT doc_id, len(ws) AS doclen, t.term
        |  FROM base, LATERAL unnest(ws) AS t(term)),
        |tf AS (
        |  SELECT doc_id, doclen, term, count(*) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(round(
        |      round(ln((n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9) *
        |      (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
        |        (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(doclen AS DOUBLE) / (total_len / n)))),
        |      9) AS DECIMAL(30,12)) AS c
        |  FROM tf JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN stats),
        |scored AS (
        |  SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
        |  FROM contrib GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM scored),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sem AS (
        |  SELECT qe.vec_id AS query_id, c.vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY qe.vec_id ORDER BY
        |      list_dot_product(c.v, qe.v) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(qe.v, qe.v))) DESC,
        |      c.vec_id) AS rank
        |  FROM e c JOIN e qe ON qe.vec_id < 3 AND c.vec_id <> qe.vec_id),
        |contribs AS (
        |  SELECT query_id, doc_id,
        |    CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(30,12)) AS c
        |  FROM lex WHERE rank <= 20
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(30,12))
        |  FROM sem WHERE rank <= 20),
        |fused AS (
        |  SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS rrf_score
        |  FROM contribs GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_score FROM (
        |  SELECT query_id, doc_id, rrf_score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rank
        |  FROM fused) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "d_blocklist_filter" ->
      """WITH block AS (
        |  SELECT DISTINCT md5(text) AS bad_fp FROM documents
        |  WHERE source = 'src1' AND doc_id % 7 = 0)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM block b WHERE md5(d.text) = b.bad_fp)
        |ORDER BY d.doc_id""".stripMargin,
    "d_blocklist_hits" ->
      """WITH block AS (
        |  SELECT DISTINCT md5(text) AS bad_fp FROM documents
        |  WHERE source = 'src1' AND doc_id % 7 = 0)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE EXISTS (SELECT 1 FROM block b WHERE md5(d.text) = b.bad_fp)
        |ORDER BY d.doc_id""".stripMargin,
    "d_ann_quantized" ->
      """WITH prep AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(greatest(-127, least(127,
        |      floor(CAST(x AS DOUBLE) * (CASE WHEN mx = 0 THEN 0 ELSE 127 / mx END) + 0.5))) AS INT)) AS q
        |  FROM prep),
        |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM qv),
        |scored AS (
        |  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
        |    list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)) AS sim
        |  FROM n a JOIN n b ON b.vec_id < 10 AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(sim, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "d_pq_encode" ->
      // RESIDUAL-form replay (FAISS by_residual): coarse routing =
      // argmax list_dot_product (ties to the lowest id), residual =
      // v - coarse[cid] elementwise, then the per-subspace argmin-L2
      // (dist = list_dot_product(c, c) - 2*list_dot_product(rsub, c),
      // same left-to-right folds as PqKernels), argmin by (dist asc,
      // k asc) via row_number, hex pairs assemble in subspace order;
      // BOTH VALUES lists interpolate from the SAME frozen Scala
      // arrays
      s"""WITH cents(s, k, c) AS (VALUES
        |  ${pqFrozen.zipWithIndex.flatMap { case (cb, s) =>
             cb.zipWithIndex.map { case (cv, k) =>
               s"($s, $k, [${cv.mkString(", ")}])" }
           }.mkString(",\n  ")}),
        |coarse(cc, cv) AS (VALUES
        |  ${pqCoarseFrozen.zipWithIndex.map { case (cv, c) =>
             s"($c, [${cv.mkString(", ")}])" }.mkString(",\n  ")}),
        |nv AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |nrm AS (
        |  SELECT vec_id,
        |    CASE WHEN sqrt(list_dot_product(e, e)) > 0
        |         THEN list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
        |         ELSE e END AS v
        |  FROM nv),
        |routed AS (
        |  SELECT vec_id, v, cc,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY list_dot_product(v, cv) DESC, cc ASC) AS crn
        |  FROM nrm CROSS JOIN coarse),
        |resid AS (
        |  SELECT r.vec_id, r.cc AS cid,
        |    list_transform(range(1, len(r.v) + 1), i -> r.v[i] - co.cv[i]) AS rv
        |  FROM routed r JOIN coarse co ON co.cc = r.cc
        |  WHERE r.crn = 1),
        |dists AS (
        |  SELECT n.vec_id, n.cid, c.s, c.k,
        |    list_dot_product(c.c, c.c)
        |      - 2 * list_dot_product(list_slice(n.rv, c.s * 16 + 1, c.s * 16 + 16), c.c) AS dist
        |  FROM resid n CROSS JOIN cents c),
        |best AS (
        |  SELECT vec_id, cid, s, k,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, k ASC) AS rn
        |  FROM dists)
        |SELECT vec_id, CAST(cid AS INT) AS cid,
        |  array_to_string(list(lpad(to_hex(k), 2, '0') ORDER BY s), '') AS code_hex
        |FROM best WHERE rn = 1
        |GROUP BY vec_id, cid
        |ORDER BY vec_id""".stripMargin,
    "d_embed_quantize" ->
      """WITH prep AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings)
        |SELECT vec_id,
        |  CASE WHEN mx = 0 THEN CAST(0 AS DOUBLE) ELSE mx / 127 END AS scale,
        |  md5(array_to_string(list_transform(embedding, x -> CAST(greatest(-127, least(127,
        |    floor(CAST(x AS DOUBLE) * (CASE WHEN mx = 0 THEN 0 ELSE 127 / mx END) + 0.5))) AS INT)), ',')) AS qvec_digest
        |FROM prep ORDER BY vec_id""".stripMargin,
    "d_c4_clean" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor sit amet.' || chr(10) ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN 'function() { var x = 1; }.' || chr(10) ELSE '' END) ||
        |    array_to_string(list_transform(range(1, CAST(ceil(len(string_split(text, ' ')) / 5.0) AS BIGINT) + 1),
        |      g -> array_to_string(list_slice(string_split(text, ' '), (g - 1) * 5 + 1, g * 5), ' ')
        |           || CASE WHEN g % 2 = 0 THEN '.' ELSE '' END), chr(10)) AS text
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id, list_filter(string_split(text, chr(10)), l ->
        |      right(l, 1) IN ('.', '!', '?', '"')
        |      AND len(string_split(l, ' ')) >= 3
        |      AND NOT contains(lower(l), 'javascript')
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS kept
        |  FROM lined)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS text, CAST(len(kept) AS INT) AS n_lines_kept
        |FROM cleaned WHERE len(kept) > 0 ORDER BY doc_id""".stripMargin,
    "d_dedup_lines" ->
      """WITH lined AS (
        |  SELECT doc_id, string_split('ACCEPT COOKIES' || chr(10) ||
        |    array_to_string(list_transform(range(1, CAST(ceil(len(string_split(text, ' ')) / 5.0) AS BIGINT) + 1),
        |      g -> array_to_string(list_slice(string_split(text, ' '), (g - 1) * 5 + 1, g * 5), ' ')), chr(10)), chr(10)) AS ls
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS pos, ls[i] AS line
        |  FROM lined, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) t),
        |hot AS (SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) > 10)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |FROM lines ANTI JOIN hot USING (line)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_dedup_lines_within" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) + 1),
        |      g -> array_to_string(list_slice(string_split(text, ' '), (g - 1) * 8 + 1, g * 8), ' ')), chr(10)) AS t2
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, string_split(t2 || chr(10) || string_split(t2, chr(10))[1], chr(10)) AS l
        |  FROM base),
        |kept AS (
        |  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
        |    list_filter(l, (x, i) -> list_position(l, x) = i) AS k
        |  FROM lined)
        |SELECT doc_id, n_lines, CAST(len(k) AS BIGINT) AS n_lines_kept,
        |  array_to_string(k, chr(10)) AS text
        |FROM kept ORDER BY doc_id""".stripMargin,
    "d_chunk_docs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id, c,
        |    array_to_string(w[c*15+1 : c*15+20], ' ') AS chunk
        |  FROM toks, UNNEST(range(0,
        |    CAST(greatest(ceil((len(w) - 20) / CAST(15 AS DOUBLE)), 0) AS BIGINT) + 1)) AS t(c)
        |)
        |SELECT doc_id, CAST(c AS INT) AS chunk_id, chunk,
        |  CAST(len(string_split(chunk, ' ')) AS INT) AS n_tokens
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "d_dedup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), wins AS (
        |  SELECT doc_id, p, array_to_string(w[p+1:p+3], ' ') AS win
        |  FROM toks, UNNEST(range(0, greatest(len(w) - 2, 0))) AS t(p)
        |), dup AS (
        |  SELECT win, min(doc_id) AS keeper
        |  FROM wins GROUP BY win HAVING count(DISTINCT doc_id) >= 2
        |), cov AS (
        |  SELECT DISTINCT w2.doc_id, w2.p + o AS pos
        |  FROM wins w2 JOIN dup d ON w2.win = d.win AND w2.doc_id <> d.keeper,
        |       UNNEST(range(0, 3)) AS tt(o)
        |), tok AS (
        |  SELECT doc_id, p AS pos, w[p+1] AS word
        |  FROM toks, UNNEST(range(0, len(w))) AS t3(p)
        |)
        |SELECT tok.doc_id AS doc_id,
        |       coalesce(string_agg(tok.word, ' ' ORDER BY tok.pos)
        |                FILTER (WHERE cov.pos IS NULL), '') AS text
        |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
        |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin,
    "d_unigram_logprob" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |freq AS (SELECT w, count(*) AS cnt FROM words GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM freq)
        |SELECT doc_id, count(*) AS n_words,
        |  round(CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / total), 9) AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS mean_logp
        |FROM words JOIN freq USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_ccnet_buckets" ->
      // same unigram score pipeline as d_unigram_logprob, then tercile
      // thresholds via quantile_cont (the same 1 + (n-1)p linear
      // interpolation percentile() uses), 9dp-rounded before the >=
      // comparisons, ties to the better bucket
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |freq AS (SELECT w, count(*) AS cnt FROM words GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM freq),
        |scores AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / total), 9) AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS mean_logp
        |  FROM words JOIN freq USING (w) CROSS JOIN tot GROUP BY doc_id),
        |cuts AS (
        |  SELECT round(quantile_cont(mean_logp, 2.0 / 3.0), 9) AS t_head,
        |         round(quantile_cont(mean_logp, 1.0 / 3.0), 9) AS t_mid
        |  FROM scores)
        |SELECT CASE WHEN mean_logp >= t_head THEN 'head'
        |            WHEN mean_logp >= t_mid THEN 'middle'
        |            ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  round(CAST(sum(CAST(mean_logp AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS mean_logp,
        |  round(min(mean_logp), 6) AS min_logp,
        |  round(max(mean_logp), 6) AS max_logp
        |FROM scores CROSS JOIN cuts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",
    "d_warc_roundtrip" ->
      // WARC serialize -> multi-record byte walk -> recover: lossless
      // by construction, so the oracle is the plain projection
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "d_warc_split_read" ->
      // write one member-per-doc .warc.gz, read it back through the
      // validated-member-boundary split reader: lossless, so the
      // oracle is the same plain projection — a missed or duplicated
      // member at any split boundary breaks the hash
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "d_url_filter" ->
      // expected canonical urls + registered domains reconstructed
      // from source/doc_id INDEPENDENTLY of the canonicalizer: scheme
      // and host lowercase, www./default port/fragment gone, tracking
      // params (incl. a LEADING utm_) healed out of the query, path
      // case preserved; co.uk rows register 3 labels. Every 4th
      // source's domains are blocked in both host shapes. `ref` is
      // content-bearing (NOT in the default tracking set) so the
      // else-branch's &ref=rss SURVIVES canonicalization.
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0
        |    THEN 'http://archive.' || source || '.co.uk/doc/' || doc_id || '?id=' || doc_id
        |    ELSE 'https://example-' || source || '.com/Doc/' || doc_id || '?id=' || doc_id || '&ref=rss'
        |  END AS url,
        |  CASE WHEN doc_id % 5 = 0 THEN source || '.co.uk'
        |    ELSE 'example-' || source || '.com' END AS domain
        |FROM documents
        |WHERE CAST(substr(source, 4) AS INT) % 4 <> 0
        |ORDER BY doc_id""".stripMargin,
    "d_crawl_pipeline" ->
      // every stage reconstructed from (doc_id, source, text): the
      // blocklist drops every 4th source; domains split by doc_id % 5;
      // per-doc tokens = w (block 3, kept iff L >= 20) + w + 5 (block
      // 4, kept iff its 14/(31+L) link density <= 0.2); dropped blocks
      // = block total - kept, where the total is 4 constant blocks
      // (nav/heading/anchor-p/footer — the first two and the footer
      // always drop) + the text block only when text is non-empty (the
      // extractor filters empty blocks before counting)
      """WITH src AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS w, len(text) AS L,
        |    CASE WHEN doc_id % 5 = 0 THEN source || '.co.uk'
        |      ELSE 'example-' || source || '.com' END AS domain
        |  FROM documents
        |  WHERE CAST(substr(source, 4) AS INT) % 4 <> 0),
        |per AS (
        |  SELECT domain,
        |    CASE WHEN L >= 20 THEN w ELSE 0 END
        |      + CASE WHEN 14.0 / (31 + L) <= 0.2 THEN w + 5 ELSE 0 END AS toks,
        |    4 + CASE WHEN L > 0 THEN 1 ELSE 0 END
        |      - CASE WHEN L >= 20 THEN 1 ELSE 0 END
        |      - CASE WHEN 14.0 / (31 + L) <= 0.2 THEN 1 ELSE 0 END AS dropped
        |  FROM src)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(dropped) AS BIGINT) AS n_blocks_dropped
        |FROM per GROUP BY domain ORDER BY domain""".stripMargin,
    "d_url_dedup" ->
      // both fetch variants canonicalize to the clean url; keep-newest
      // surfaces the re-crawl's updated text, n_fetches counts both
      """SELECT 'https://example-' || source || '.com/Doc/' || doc_id AS url,
        |  'updated: ' || text AS text,
        |  CAST(2 AS BIGINT) AS n_fetches
        |FROM documents ORDER BY url""".stripMargin,
    "d_crawl_gates" ->
      // survivors = not domain-blocked (src%4), not robots-disallowed
      // (src%5), not noindex (doc%7); canonical url has %61 decoded,
      // www/scheme-case healed; single-block token count
      """SELECT 'https://' || source || '.example/page/' || doc_id AS url,
        |  CAST(CASE WHEN len(text) >= 20
        |       THEN len(string_split(text, ' ')) ELSE 0 END AS BIGINT) AS n_tokens
        |FROM documents
        |WHERE CAST(substr(source, 4) AS INT) % 4 <> 0
        |  AND CAST(substr(source, 4) AS INT) % 5 <> 0
        |  AND doc_id % 7 <> 0
        |ORDER BY url""".stripMargin,
    "d_link_graph" ->
      // every edge rebuilt by string arithmetic: the five resolvable
      // forms resolve against base https://<source>.example.com/a/<id>/
      // (absolute kept, /doc -> origin, sub/ -> base dir, // -> https:,
      // /tos nofollow); the fragment-only anchor contributes no row
      """WITH links AS (
        |  SELECT doc_id, 'https://ext.example/d/' || doc_id AS href,
        |    'external ' || doc_id AS anchor_text, FALSE AS nofollow FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'https://' || source || '.example.com/doc/' || (doc_id + 1),
        |    'next doc', FALSE FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'https://' || source || '.example.com/a/' || doc_id || '/sub/page.html',
        |    'sub page', FALSE FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'https://cdn.example/lib.js', 'cdn asset', FALSE FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'https://' || source || '.example.com/tos',
        |    'terms', TRUE FROM documents)
        |SELECT doc_id, href, anchor_text, nofollow
        |FROM links ORDER BY doc_id, href""".stripMargin,
    "d_crawl_frontier" ->
      // unseen candidates rebuilt by arithmetic: the self links
      // canonicalize to the fetched base (no row), /tos is nofollow
      // (no row), cdn collects the corpus; domains follow the
      // registered-domain heuristic on the three known host shapes
      """WITH cand AS (
        |  SELECT 'https://ext.example/d/' || doc_id AS url FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/doc/' || (doc_id + 1) FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/a/' || doc_id || '/sub/page.html' FROM documents
        |  UNION ALL
        |  SELECT 'https://cdn.example/lib.js' FROM documents),
        |agg AS (SELECT url, CAST(count(*) AS BIGINT) AS n_inlinks FROM cand GROUP BY url)
        |SELECT url,
        |  CASE WHEN url LIKE 'https://ext.example/%' THEN 'ext.example'
        |       WHEN url LIKE 'https://cdn.example/%' THEN 'cdn.example'
        |       ELSE 'example.com' END AS domain,
        |  n_inlinks
        |FROM agg ORDER BY n_inlinks DESC, url""".stripMargin,
    "d_crawl_frontier_ranked" ->
      // 3 seeded-PageRank iterations unrolled (drop mode: no dangling
      // CTEs) over the domain ring+hub graph, joined onto the
      // arithmetic-rebuilt candidate set; PSL-exact domains =
      // source || '.example.com', off-graph domains rank 0
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |doms AS (SELECT source || '.example.com' AS dmn FROM s),
        |ring AS (SELECT dmn AS src,
        |    COALESCE(LEAD(dmn) OVER (ORDER BY dmn),
        |             (SELECT min(dmn) FROM doms)) AS dst FROM doms),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT dmn, 'hub.example' FROM doms),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.deg FROM edges e JOIN od USING (src)),
        |sd AS (SELECT dmn AS n FROM doms ORDER BY dmn LIMIT 5),
        |k AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM sd),
        |r0 AS (SELECT nodes.n, CASE WHEN sd.n IS NOT NULL THEN round(1.0 / k.kk, 9) ELSE 0.0 END AS r
        |  FROM nodes CROSS JOIN k LEFT JOIN sd ON nodes.n = sd.n),
        |i1 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN k LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(r0.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN r0 ON ed.src = r0.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i2 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN k LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i1.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i1 ON ed.src = i1.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i3 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN k LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i2.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i2 ON ed.src = i2.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |pr AS (SELECT n, round(r, 6) AS rank FROM i3),
        |cand AS (
        |  SELECT 'https://ext.example/d/' || doc_id AS url,
        |    'ext.example' AS domain FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/doc/' || (doc_id + 1),
        |    source || '.example.com' FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/a/' || doc_id || '/sub/page.html',
        |    source || '.example.com' FROM documents
        |  UNION ALL
        |  SELECT 'https://cdn.example/lib.js', 'cdn.example' FROM documents),
        |agg AS (SELECT url, domain, CAST(count(*) AS BIGINT) AS n_inlinks
        |  FROM cand GROUP BY url, domain)
        |SELECT url, domain, n_inlinks, COALESCE(pr.rank, 0.0) AS rank
        |FROM agg LEFT JOIN pr ON agg.domain = pr.n
        |ORDER BY rank DESC, n_inlinks DESC, url""".stripMargin,
    "d_sitemap" ->
      // four entries per doc rebuilt by arithmetic: the full-hint
      // url, the escaped loc (&amp; decoded), the malformed-priority
      // url (null), and the sitemapindex pointer
      """WITH base AS (SELECT doc_id, source,
        |  '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lm
        |  FROM documents)
        |SELECT doc_id, 'url' AS kind,
        |  'https://' || source || '.example.com/a/' || doc_id AS loc,
        |  lm AS lastmod, 'daily' AS changefreq, CAST(0.8 AS DOUBLE) AS priority
        |FROM base
        |UNION ALL
        |SELECT doc_id, 'url', 'https://' || source || '.example.com/q?a=1&b=' || doc_id,
        |  NULL, NULL, NULL FROM base
        |UNION ALL
        |SELECT doc_id, 'url', 'https://' || source || '.example.com/p/' || doc_id,
        |  NULL, NULL, NULL FROM base
        |UNION ALL
        |SELECT doc_id, 'sitemap',
        |  'https://' || source || '.example.com/sitemap-' || doc_id || '.xml',
        |  NULL, NULL, NULL FROM base
        |ORDER BY doc_id, kind, loc""".stripMargin,
    "d_fetch_schedule" ->
      // the frontier CTE with hosts from the known shapes, then the
      // identical per-host (n_inlinks desc, url) window split into
      // waves of 2
      """WITH cand AS (
        |  SELECT 'https://ext.example/d/' || doc_id AS url,
        |    'ext.example' AS host FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/doc/' || (doc_id + 1),
        |    source || '.example.com' FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/a/' || doc_id || '/sub/page.html',
        |    source || '.example.com' FROM documents
        |  UNION ALL
        |  SELECT 'https://cdn.example/lib.js', 'cdn.example' FROM documents),
        |agg AS (SELECT url, host, CAST(count(*) AS BIGINT) AS n_inlinks
        |  FROM cand GROUP BY url, host),
        |rn AS (SELECT url, host, n_inlinks,
        |  ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_inlinks DESC, url) - 1 AS r
        |  FROM agg)
        |SELECT url, host, n_inlinks,
        |  CAST(floor(r / 2.0) AS BIGINT) AS wave, CAST(r % 2 AS BIGINT) AS slot
        |FROM rn ORDER BY host, wave, slot""".stripMargin,
    "d_crawl_diff" ->
      // every status from doc_id arithmetic: %5 gone (no wave-2 row),
      // else %3 changed (md5 of the rewritten text), else unchanged;
      // %7 docs discover an added /p2 page with no wave-1 row
      """WITH base AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/a/' || doc_id AS url, text
        |  FROM documents)
        |SELECT url,
        |  CASE WHEN doc_id % 5 = 0 THEN 'gone'
        |       WHEN doc_id % 3 = 0 THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  md5(text) AS fp_prev,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN md5(text || ' v2')
        |       ELSE md5(text) END AS fp_curr
        |FROM base
        |UNION ALL
        |SELECT url || '/p2', 'added', NULL, md5(text || ' p2')
        |FROM base WHERE doc_id % 7 = 0
        |ORDER BY url""".stripMargin,
    "d_fetch_delay" ->
      // the per-host window replay + the delay CASE from the same
      // source-suffix arithmetic (group selection resolved by hand:
      // specific beats *, * delay applies, absent -> default 5.0)
      """WITH f AS (
        |  SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |    source || '.example.com' AS host, doc_id % 7 AS n_inlinks,
        |    CAST(substring(source, 4) AS INT) % 3 AS m
        |  FROM documents),
        |rn AS (
        |  SELECT url, host, n_inlinks, m,
        |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_inlinks DESC, url) - 1 AS r
        |  FROM f)
        |SELECT url, n_inlinks, host,
        |  CAST(floor(r / 2.0) AS BIGINT) AS wave, CAST(r % 2 AS BIGINT) AS slot,
        |  CASE WHEN m = 0 THEN 2.5 WHEN m = 1 THEN 7.0 ELSE 5.0 END AS crawl_delay,
        |  CAST(floor(r / 2.0) AS DOUBLE) *
        |    CASE WHEN m = 0 THEN 2.5 WHEN m = 1 THEN 7.0 ELSE 5.0 END AS fetch_at_sec
        |FROM rn ORDER BY url""".stripMargin,
    "d_recrawl_rate" ->
      // X rebuilt per url straight from the planted rule (each marked
      // wave bumps the cumulative-count fingerprint exactly once),
      // then the same Cho/Garcia-Molina arithmetic: m = 4 comparisons,
      // rate = ln(4.5/(4.5 - X))/7 at 9 dp, next = 7/ln-part at 6 dp
      // capped at 365
      """WITH x AS (
        |  SELECT 'https://site-' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/'
        |           || CAST(doc_id AS VARCHAR) AS url,
        |    len(list_filter(range(1, 5), v ->
        |      CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 12)) AS UBIGINT)
        |      % 100 < doc_id % 100)) AS n_chg
        |  FROM documents)
        |SELECT url, CAST(5 AS BIGINT) AS n_fetches, CAST(n_chg AS BIGINT) AS n_changes,
        |  round(ln(4.5 / (4.5 - n_chg)) / 7.0, 9) AS change_rate,
        |  CASE WHEN n_chg = 0 THEN 365.0
        |       ELSE least(365.0, round(7.0 / ln(4.5 / (4.5 - n_chg)), 6)) END AS next_fetch
        |FROM x ORDER BY url""".stripMargin,
    "d_anchor_text" ->
      // per-target aggregates rebuilt by arithmetic: three unique
      // per-doc targets with one anchor each, one corpus-wide cdn
      // target, and NO row for the nofollow-only /tos targets
      """WITH per AS (
        |  SELECT 'https://ext.example/d/' || doc_id AS href,
        |    CAST(1 AS BIGINT) AS n_links, 'external ' || doc_id AS anchors
        |  FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/doc/' || (doc_id + 1),
        |    CAST(1 AS BIGINT), 'next doc' FROM documents
        |  UNION ALL
        |  SELECT 'https://' || source || '.example.com/a/' || doc_id || '/sub/page.html',
        |    CAST(1 AS BIGINT), 'sub page' FROM documents
        |  UNION ALL
        |  SELECT 'https://cdn.example/lib.js',
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents), 'cdn asset')
        |SELECT href, n_links, anchors FROM per ORDER BY href""".stripMargin,
    "d_domain_rank" ->
      // the engine's 5 iterations unrolled: per-edge contributions
      // round 9dp and sum as DECIMAL(30,12), ranks round 9dp per
      // iteration, 6dp emit — the exact determinism contract, so the
      // hash matches bit-for-bit
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.deg FROM edges e JOIN od USING (src)),
        |r0 AS (SELECT n, round(1.0 / c.nn, 9) AS r FROM nodes CROSS JOIN c),
        |i1 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN c LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(r0.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN r0 ON ed.src = r0.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i2 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN c LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i1.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i1 ON ed.src = i1.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i3 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN c LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i2.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i2 ON ed.src = i2.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i4 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN c LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i3.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i3 ON ed.src = i3.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |i5 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * COALESCE(CAST(t.sc AS DOUBLE), 0.0), 9) AS r
        |  FROM nodes CROSS JOIN c LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i4.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i4 ON ed.src = i4.n GROUP BY ed.dst) t ON nodes.n = t.n)
        |SELECT n, round(r, 6) AS rank FROM i5 ORDER BY rank DESC, n""".stripMargin,
    "d_domain_rank_dangling" ->
      // d_domain_rank's unrolled iterations plus the standard
      // dangling-mass redistribution: dK = exact DECIMAL(30,12) sum of
      // the 9dp ranks of no-out-edge nodes, added back uniformly
      // (CAST(dK AS DOUBLE) / nn) inside the damped term — the same
      // order of double operations as the engine
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.deg FROM edges e JOIN od USING (src)),
        |r0 AS (SELECT n, round(1.0 / c.nn, 9) AS r FROM nodes CROSS JOIN c),
        |d0 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM r0
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i1 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CAST(d0.ds AS DOUBLE) / c.nn), 9) AS r
        |  FROM nodes CROSS JOIN c CROSS JOIN d0 LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(r0.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN r0 ON ed.src = r0.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d1 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i1
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i2 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CAST(d1.ds AS DOUBLE) / c.nn), 9) AS r
        |  FROM nodes CROSS JOIN c CROSS JOIN d1 LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i1.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i1 ON ed.src = i1.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d2 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i2
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i3 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CAST(d2.ds AS DOUBLE) / c.nn), 9) AS r
        |  FROM nodes CROSS JOIN c CROSS JOIN d2 LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i2.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i2 ON ed.src = i2.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d3 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i3
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i4 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CAST(d3.ds AS DOUBLE) / c.nn), 9) AS r
        |  FROM nodes CROSS JOIN c CROSS JOIN d3 LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i3.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i3 ON ed.src = i3.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d4 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i4
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i5 AS (SELECT nodes.n, round((1 - 0.85) / c.nn + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CAST(d4.ds AS DOUBLE) / c.nn), 9) AS r
        |  FROM nodes CROSS JOIN c CROSS JOIN d4 LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i4.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i4 ON ed.src = i4.n GROUP BY ed.dst) t ON nodes.n = t.n)
        |SELECT n, round(r, 6) AS rank FROM i5 ORDER BY rank DESC, n""".stripMargin,
    "d_domain_rank_seeded" ->
      // personalized PageRank unrolled: teleport (the (1-d) restart,
      // the initial mass, and each iteration's dangling sum) goes to
      // the 5-seed set only — per-node CASE terms with the same
      // double-op order as the engine
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.deg FROM edges e JOIN od USING (src)),
        |sd AS (SELECT source AS n FROM s ORDER BY source LIMIT 5),
        |k AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM sd),
        |r0 AS (SELECT nodes.n, CASE WHEN sd.n IS NOT NULL THEN round(1.0 / k.kk, 9) ELSE 0.0 END AS r
        |  FROM nodes CROSS JOIN k LEFT JOIN sd ON nodes.n = sd.n),
        |d0 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM r0
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i1 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CASE WHEN sd.n IS NOT NULL THEN CAST(d0.ds AS DOUBLE) / k.kk ELSE 0.0 END), 9) AS r
        |  FROM nodes CROSS JOIN k CROSS JOIN d0 LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(r0.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN r0 ON ed.src = r0.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d1 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i1
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i2 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CASE WHEN sd.n IS NOT NULL THEN CAST(d1.ds AS DOUBLE) / k.kk ELSE 0.0 END), 9) AS r
        |  FROM nodes CROSS JOIN k CROSS JOIN d1 LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i1.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i1 ON ed.src = i1.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d2 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i2
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i3 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CASE WHEN sd.n IS NOT NULL THEN CAST(d2.ds AS DOUBLE) / k.kk ELSE 0.0 END), 9) AS r
        |  FROM nodes CROSS JOIN k CROSS JOIN d2 LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i2.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i2 ON ed.src = i2.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d3 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i3
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i4 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CASE WHEN sd.n IS NOT NULL THEN CAST(d3.ds AS DOUBLE) / k.kk ELSE 0.0 END), 9) AS r
        |  FROM nodes CROSS JOIN k CROSS JOIN d3 LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i3.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i3 ON ed.src = i3.n GROUP BY ed.dst) t ON nodes.n = t.n),
        |d4 AS (SELECT COALESCE(sum(CAST(r AS DECIMAL(30,12))), 0) AS ds FROM i4
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |i5 AS (SELECT nodes.n, round(CASE WHEN sd.n IS NOT NULL THEN (1 - 0.85) / k.kk ELSE 0.0 END + 0.85 * (COALESCE(CAST(t.sc AS DOUBLE), 0.0) + CASE WHEN sd.n IS NOT NULL THEN CAST(d4.ds AS DOUBLE) / k.kk ELSE 0.0 END), 9) AS r
        |  FROM nodes CROSS JOIN k CROSS JOIN d4 LEFT JOIN sd ON nodes.n = sd.n LEFT JOIN (
        |    SELECT ed.dst AS n, sum(CAST(round(i4.r / ed.deg, 9) AS DECIMAL(30,12))) AS sc
        |    FROM ed JOIN i4 ON ed.src = i4.n GROUP BY ed.dst) t ON nodes.n = t.n)
        |SELECT n, round(r, 6) AS rank FROM i5 ORDER BY rank DESC, n""".stripMargin,
    "d_curriculum" ->
      // same quartile cuts via quantile_cont (== Spark's exact
      // percentile), same <=-boundary rule, same salted md5 keys
      """WITH t AS (SELECT doc_id, CAST(doc_id % 97 AS DOUBLE) AS score
        |  FROM documents),
        |c AS (SELECT quantile_cont(score, [0.25, 0.5, 0.75]) AS q FROM t)
        |SELECT doc_id, score,
        |  CASE WHEN score <= q[1] THEN 0 WHEN score <= q[2] THEN 1
        |       WHEN score <= q[3] THEN 2 ELSE 3 END AS bucket,
        |  md5(CAST(doc_id AS VARCHAR) || ':graft') AS shuffle_key
        |FROM t, c ORDER BY bucket, shuffle_key""".stripMargin,
    "d_token_budget" ->
      // the engine's distributed prefix sum == one SQL running-sum
      // window over the same total order; tokens are non-negative so
      // cum is monotone and the <= filter IS the prefix
      """WITH t AS (SELECT doc_id,
        |    CAST(doc_id % 100 AS DOUBLE) AS score,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT doc_id, score, n_tokens FROM r WHERE cum <= 15000
        |ORDER BY score DESC, doc_id""".stripMargin,
    "d_script_detect" ->
      // same planted runs via chr(); codepoint-range classes mean
      // the same thing in RE2 as in Java regex, so counts, 6dp
      // fractions, and the priority-ordered dominance CASE all
      // hash-match
      """WITH t AS (
        |  SELECT doc_id, text || ' ' ||
        |    repeat(chr(CAST(1040 + doc_id % 32 AS INT)), CAST(doc_id % 7 AS INT)) ||
        |    repeat(chr(CAST(19968 + doc_id % 64 AS INT)), CAST(doc_id % 5 AS INT)) AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]')) AS BIGINT) AS n_cjk,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
        |  FROM t
        |), m AS (
        |  SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_cjk) AS mx FROM c
        |)
        |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk, n_digit,
        |  round(CAST(n_latin AS DOUBLE) / n_chars, 6) AS frac_latin,
        |  round(CAST(n_cyrillic AS DOUBLE) / n_chars, 6) AS frac_cyrillic,
        |  round(CAST(n_cjk AS DOUBLE) / n_chars, 6) AS frac_cjk,
        |  CASE WHEN mx = 0 THEN 'none'
        |       WHEN n_latin = mx THEN 'latin'
        |       WHEN n_cyrillic = mx THEN 'cyrillic'
        |       WHEN n_greek = mx THEN 'greek'
        |       WHEN n_arabic = mx THEN 'arabic'
        |       ELSE 'cjk' END AS dominant_script
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_sync_evolve" ->
      // v0 keeps the float round-trip (CAST via FLOAT), v1 keeps the
      // native double; priority nulls where the v1 feed dropped it,
      // status nulls where only v0 exists
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice
        |       ELSE CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) END AS price,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS priority,
        |  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS INT) AS ver,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'B' ELSE NULL END AS status
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "d_bpe_encode_bytes" ->
      // the d_bpe_encode replay over BYTE symbols: hex(w) is the
      // word's UTF-8 bytes as uppercase hex (DuckDB hex == the JVM
      // byteSymbols form), decorated into '|'-bounded hex PAIRS; the
      // 9 byte merges replay in rank order as non-overlapping
      // replace() passes (same chained-merge structure, same in-order
      // == greedy equivalence), then boundaries become spaces
      """SELECT doc_id,
        |  CAST(len(string_split(tokens_str, ' ')) AS BIGINT) AS n_tokens,
        |  tokens_str
        |FROM (
        |  SELECT doc_id, array_to_string(list_transform(
        |    list_filter(string_split(text || ' café 的', ' '), w -> w <> ''),
        |    w -> replace(trim(
        |      replace(replace(replace(replace(replace(replace(replace(replace(replace(
        |        '||' || regexp_replace(hex(w), '([0-9A-F]{2})', '\1||', 'g') || '</w>||',
        |        '|65||</w>|', '|65</w>|'),
        |        '|74||68|', '|7468|'),
        |        '|7468||65</w>|', '|746865</w>|'),
        |        '|64||</w>|', '|64</w>|'),
        |        '|69||6E|', '|696E|'),
        |        '|61||6E|', '|616E|'),
        |        '|6F||6E|', '|6F6E|'),
        |        '|65||72|', '|6572|'),
        |        '|616E||64</w>|', '|616E64</w>|'),
        |      '|'), '||', ' ')), ' ') AS tokens_str
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "d_bpe_encode" ->
      // symbols ride a '|'-decorated string ('||' between symbols and
      // at both ends — each replace consumes one '|' per side, so
      // adjacent merge sites never steal each other's boundary); the
      // 8 merges replay IN RANK ORDER as plain non-overlapping
      // replace() passes, then boundaries become spaces
      """SELECT doc_id,
        |  CAST(len(string_split(tokens_str, ' ')) AS BIGINT) AS n_tokens,
        |  tokens_str
        |FROM (
        |  SELECT doc_id, array_to_string(list_transform(
        |    list_filter(string_split(text, ' '), w -> w <> ''),
        |    w -> replace(trim(
        |      replace(replace(replace(replace(replace(replace(replace(replace(replace(
        |        '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||',
        |        '|e||</w>|', '|e</w>|'),
        |        '|t||h|', '|th|'),
        |        '|th||e</w>|', '|the</w>|'),
        |        '|d||</w>|', '|d</w>|'),
        |        '|i||n|', '|in|'),
        |        '|a||n|', '|an|'),
        |        '|o||n|', '|on|'),
        |        '|e||r|', '|er|'),
        |        '|an||d</w>|', '|and</w>|'),
        |      '|'), '||', ' ')), ' ') AS tokens_str
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "d_unigram_encode" ->
      // Viterbi value under the frozen model, re-derived per DISTINCT
      // word by recursive-CTE enumeration of reachable DP states
      // (pos, cost, pieces): edges are any single char at cost 5 plus
      // the frozen pieces at cost 7; UNION dedup bounds the state
      // space, the optimum is min cost then min piece count — exactly
      // the engine's tie-break — and docs recover their totals by
      // occurrence-count join
      """WITH RECURSIVE wordcounts AS (
        |  SELECT doc_id, w, count(*) AS n
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w
        |), dwords AS (
        |  SELECT DISTINCT w FROM wordcounts
        |), pieces AS (
        |  SELECT * FROM (VALUES ('the',7),('and',7),('ing',7),('ion',7),
        |    ('ent',7),('er',7),('in',7),('on',7),('at',7),('es',7),('en',7),
        |    ('ed',7),('te',7),('al',7),('re',7),('st',7),('ar',7),('nd',7),
        |    ('he',7),('an',7)) t(p, c)
        |), positions AS (
        |  SELECT w, CAST(t.i AS INT) AS i
        |  FROM dwords, UNNEST(range(0, len(w))) t(i)
        |), edges AS (
        |  SELECT w, i, i + 1 AS j, 5 AS c FROM positions
        |  UNION ALL
        |  SELECT p0.w, p0.i, p0.i + len(pc.p) AS j, pc.c
        |  FROM positions p0 JOIN pieces pc
        |    ON substring(p0.w, p0.i + 1, CAST(len(pc.p) AS INT)) = pc.p
        |), reach(w, pos, cost, np) AS (
        |  SELECT w, CAST(0 AS INT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM dwords
        |  UNION
        |  SELECT e.w, CAST(e.j AS INT), r.cost + e.c, r.np + 1
        |  FROM reach r JOIN edges e ON e.w = r.w AND e.i = r.pos
        |), final AS (
        |  SELECT w, cost, np FROM reach WHERE pos = len(w)
        |), bestc AS (
        |  SELECT w, min(cost) AS cost FROM final GROUP BY w
        |), best AS (
        |  SELECT f.w, f.cost, min(f.np) AS np
        |  FROM final f JOIN bestc b ON b.w = f.w AND b.cost = f.cost
        |  GROUP BY f.w, f.cost
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(sum(wc.n * b.np), 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(wc.n * b.cost), 0) AS BIGINT) AS total_cost
        |FROM documents d
        |LEFT JOIN wordcounts wc ON wc.doc_id = d.doc_id
        |LEFT JOIN best b ON b.w = wc.w
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "d_bpe_fertility" ->
      // n_tokens via the d_bpe_encode replay; n_words directly from
      // the word split (== the engine's marker count by construction)
      """WITH enc AS (
        |  SELECT doc_id, list_transform(
        |    list_filter(string_split(text, ' '), w -> w <> ''),
        |    w -> replace(trim(
        |      replace(replace(replace(replace(replace(replace(replace(replace(replace(
        |        '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||',
        |        '|e||</w>|', '|e</w>|'),
        |        '|t||h|', '|th|'),
        |        '|th||e</w>|', '|the</w>|'),
        |        '|d||</w>|', '|d</w>|'),
        |        '|i||n|', '|in|'),
        |        '|a||n|', '|an|'),
        |        '|o||n|', '|on|'),
        |        '|e||r|', '|er|'),
        |        '|an||d</w>|', '|and</w>|'),
        |      '|'), '||', ' ')) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(len(string_split(array_to_string(toks, ' '), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split(array_to_string(toks, ' '), ' ')) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) AS fertility
        |FROM enc ORDER BY doc_id""".stripMargin,
    "d_wordpiece_encode" ->
      // greedy longest-match replayed as a recursive-CTE walk: per
      // (word, position) the LONGEST matching vocab piece (initial vs
      // ## form keyed off position), the greedy path advances by that
      // length, a word whose path never reaches len(w) is [UNK]; docs
      // reassemble token strings by word ordinal. The VALUES list is
      // interpolated from the SAME frozen Scala vocabulary.
      s"""WITH RECURSIVE vocab(p) AS (VALUES ${wordpieceFrozen.map(p => s"('$p')").mkString(", ")}),
        |vocab0 AS (
        |  SELECT CASE WHEN p LIKE '##%' THEN substring(p, 3) ELSE p END AS s,
        |         (p LIKE '##%') AS cont
        |  FROM vocab),
        |docw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, CAST(t.i AS INT) AS i,
        |         list_extract(ws, CAST(t.i AS INT)) AS w
        |  FROM docw, UNNEST(range(1, len(ws) + 1)) t(i)),
        |dwords AS (SELECT DISTINCT w FROM occ),
        |matches AS (
        |  SELECT d.w, CAST(t.i AS INT) AS i, CAST(max(len(v.s)) AS INT) AS mlen
        |  FROM dwords d
        |  CROSS JOIN UNNEST(range(0, len(d.w))) t(i)
        |  JOIN vocab0 v
        |    ON v.cont = (t.i > 0)
        |   AND substring(d.w, CAST(t.i AS INT) + 1, CAST(len(v.s) AS INT)) = v.s
        |  GROUP BY d.w, t.i),
        |greedy(w, pos, toks, nt) AS (
        |  SELECT w, 0, CAST('' AS VARCHAR), 0 FROM dwords
        |  UNION ALL
        |  SELECT g.w, g.pos + m.mlen,
        |    g.toks || CASE WHEN g.pos = 0 THEN '' ELSE ' ##' END ||
        |      substring(g.w, g.pos + 1, m.mlen),
        |    g.nt + 1
        |  FROM greedy g JOIN matches m ON m.w = g.w AND m.i = g.pos
        |  WHERE g.pos < len(g.w)),
        |done AS (SELECT w, toks, nt FROM greedy WHERE pos = len(w)),
        |wordtok AS (
        |  SELECT d.w,
        |    CASE WHEN len(d.w) > 100 OR dn.w IS NULL THEN '[UNK]' ELSE dn.toks END AS toks,
        |    CASE WHEN len(d.w) > 100 OR dn.w IS NULL THEN 1 ELSE dn.nt END AS nt
        |  FROM dwords d LEFT JOIN done dn ON dn.w = d.w)
        |SELECT dd.doc_id,
        |  CAST(coalesce(sum(wt.nt), 0) AS BIGINT) AS n_tokens,
        |  coalesce(array_to_string(list(wt.toks ORDER BY o.i), ' '), '') AS tokens_str
        |FROM documents dd
        |LEFT JOIN occ o ON o.doc_id = dd.doc_id
        |LEFT JOIN wordtok wt ON wt.w = o.w
        |GROUP BY dd.doc_id
        |ORDER BY dd.doc_id""".stripMargin,
    "d_wordpiece_pairs" ->
      // round-0 likelihood scores: unigram and adjacent-pair symbol
      // counts from the same word-freq table, score = cnt/(ca*cb)
      """WITH wf AS (
        |  SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |    FROM documents) GROUP BY w),
        |syms AS (
        |  SELECT w, freq, CAST(t.i AS INT) AS i,
        |    CASE WHEN t.i = 1 THEN substring(w, 1, 1)
        |         ELSE '##' || substring(w, CAST(t.i AS INT), 1) END AS sym
        |  FROM wf, UNNEST(range(1, len(w) + 1)) t(i)),
        |uni AS (SELECT sym, sum(freq) AS ucnt FROM syms GROUP BY sym),
        |pairs AS (
        |  SELECT a.sym AS a, b.sym AS b, sum(a.freq) AS cnt
        |  FROM syms a JOIN syms b ON a.w = b.w AND b.i = a.i + 1
        |  GROUP BY a.sym, b.sym)
        |SELECT p.a, p.b, CAST(p.cnt AS BIGINT) AS cnt,
        |  CAST(p.cnt AS DOUBLE) /
        |    (CAST(ua.ucnt AS DOUBLE) * CAST(ub.ucnt AS DOUBLE)) AS score
        |FROM pairs p
        |JOIN uni ua ON ua.sym = p.a
        |JOIN uni ub ON ub.sym = p.b
        |ORDER BY score DESC, a ASC, b ASC LIMIT 50""".stripMargin,
    "q_funnel_windowed" ->
      // greedy earliest-reach == sequential correlated minima:
      // t0 = min(view); t1 = min(click) in (t0, t0+2h];
      // t2 = min(purchase) in (t1, t1+2h]
      """WITH e AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT user_id, min(ts) AS t0 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(ts) AS t1 FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'click' AND ts > t0 AND ts <= t0 + INTERVAL 2 HOUR
        |       GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'purchase' AND ts > t1 AND ts <= t1 + INTERVAL 2 HOUR
        |       GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS step_name, (SELECT CAST(count(*) AS BIGINT) FROM s0) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s2))
        |ORDER BY step""".stripMargin,
    "q_anomaly_zscore" ->
      // identical fixed-order arithmetic: mean = sum/n,
      // var = sumsq/n - mean*mean, single sqrt and quotient
      """WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, bucket_ts, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS mean,
        |    CAST(sum(n * n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS ssq
        |  FROM b)
        |SELECT event_type, bucket_ts, n,
        |  CASE WHEN ssq - mean * mean <= 0 THEN 0.0
        |       ELSE (CAST(n AS DOUBLE) - mean) / sqrt(ssq - mean * mean) END AS z,
        |  CASE WHEN ssq - mean * mean <= 0 THEN FALSE
        |       ELSE abs((CAST(n AS DOUBLE) - mean) / sqrt(ssq - mean * mean)) >= 2.5
        |       END AS is_anomaly
        |FROM s ORDER BY event_type, bucket_ts""".stripMargin,
    "q_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "d_license_detect" ->
      // same synthesis, same RE2 markers in priority order
      """WITH mixed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      (CASE WHEN doc_id % 4 = 0 THEN '// SPDX-License-Identifier: MIT' || chr(10)
        |            WHEN doc_id % 4 = 1 THEN '// GNU GENERAL PUBLIC LICENSE Version 3' || chr(10)
        |            WHEN doc_id % 4 = 2 THEN '// This is free and unencumbered software released into the public domain' || chr(10)
        |            ELSE '// internal tool' || chr(10) END)
        |      || array_to_string(list_transform(string_split(text, ' '),
        |           (w, i) -> '  let v' || CAST(i - 1 AS VARCHAR) || ' = "' || w || '";'), chr(10))
        |    ELSE text END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN regexp_matches(text, '(?i)(SPDX-License-Identifier:\s*(GPL|AGPL|LGPL)|GNU (GENERAL|LESSER|AFFERO) PUBLIC LICENSE|GPL-[23]\.0)') THEN 'copyleft'
        |         WHEN regexp_matches(text, '(?i)(SPDX-License-Identifier:\s*(MIT|Apache|BSD|ISC)|Permission is hereby granted, free of charge|Licensed under the Apache License|Redistribution and use in source and binary forms)') THEN 'permissive'
        |         WHEN regexp_matches(text, '(?i)(SPDX-License-Identifier:\s*(CC0|Unlicense)|This is free and unencumbered software released into the public domain)') THEN 'public_domain'
        |         ELSE 'none' END AS license_class
        |  FROM mixed)
        |SELECT doc_id, license_class,
        |  license_class IN ('permissive', 'public_domain') AS redistributable
        |FROM c ORDER BY doc_id""".stripMargin,
    "d_code_detect" ->
      // same synthesis; ratios from the same regexp arithmetic, the
      // verdict disjunction over the ROUNDED values
      """WITH mixed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      (CASE WHEN doc_id % 4 = 0 THEN '// SPDX-License-Identifier: MIT' || chr(10)
        |            WHEN doc_id % 4 = 1 THEN '// GNU GENERAL PUBLIC LICENSE Version 3' || chr(10)
        |            WHEN doc_id % 4 = 2 THEN '// This is free and unencumbered software released into the public domain' || chr(10)
        |            ELSE '// internal tool' || chr(10) END)
        |      || array_to_string(list_transform(string_split(text, ' '),
        |           (w, i) -> '  let v' || CAST(i - 1 AS VARCHAR) || ' = "' || w || '";'), chr(10))
        |    ELSE text END AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    round((length(text) - length(regexp_replace(text, '[{}();=<>\[\]]', '', 'g'))) / length(text), 6) AS symbol_ratio,
        |    round(len(regexp_extract_all(text, '(?m)^(  |\t)'))
        |          / (length(text) - length(replace(text, chr(10), '')) + 1), 6) AS indent_ratio,
        |    round(len(regexp_extract_all(text, '(?m)[;{}]$'))
        |          / (length(text) - length(replace(text, chr(10), '')) + 1), 6) AS eol_ratio
        |  FROM mixed)
        |SELECT doc_id, symbol_ratio, indent_ratio, eol_ratio,
        |  symbol_ratio >= 0.04 OR (indent_ratio >= 0.3 AND eol_ratio >= 0.15) AS is_code
        |FROM r ORDER BY doc_id""".stripMargin,
    "d_markdown_strip" ->
      // same synthesis (DuckDB 1-based i == Spark i+1; newlines via
      // chr(10) — DuckDB string literals don't interpret \n), then the
      // same nine-pass RE2 chain with \1 backrefs and 'g'
      """WITH md AS (
        |  SELECT doc_id,
        |    '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
        |    '> intro quote' || chr(10) || chr(10) ||
        |    array_to_string(list_transform(string_split(text, ' '), (w, i) ->
        |      CASE WHEN i % 23 = 0 THEN '[' || w || '](https://x.example/' || CAST(i AS VARCHAR) || ')'
        |           WHEN i % 29 = 0 THEN '**' || w || '**'
        |           WHEN i % 31 = 0 THEN '`' || w || '`'
        |           ELSE w END), ' ') ||
        |    chr(10) || chr(10) || '```' || chr(10) || 'let x = 1;' || chr(10) || '```' ||
        |    chr(10) || chr(10) || '- alpha' || chr(10) || '- beta' || chr(10) || chr(10) ||
        |    '---' || chr(10) || '![logo](https://x.example/logo.png)' AS text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, '(?s)```.*?```', '', 'g') AS s1
        |  FROM md),
        |s2 AS (SELECT doc_id, text, regexp_replace(s1, '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS s FROM s),
        |s3 AS (SELECT doc_id, text, regexp_replace(s, '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS s FROM s2),
        |s4 AS (SELECT doc_id, text, regexp_replace(s, '`([^`]*)`', '\1', 'g') AS s FROM s3),
        |s5 AS (SELECT doc_id, text, regexp_replace(s, '(?m)^#{1,6} +', '', 'g') AS s FROM s4),
        |s6 AS (SELECT doc_id, text, regexp_replace(s, '(?m)^> ?', '', 'g') AS s FROM s5),
        |s7 AS (SELECT doc_id, text, regexp_replace(regexp_replace(s, '\*{1,3}([^*\n]+)\*{1,3}', '\1', 'g'), '__([^_\n]+)__', '\1', 'g') AS s FROM s6),
        |s8 AS (SELECT doc_id, text, regexp_replace(s, '(?m)^[ \t]*([-*+]|\d+\.) +', '', 'g') AS s FROM s7),
        |s9 AS (SELECT doc_id, text, regexp_replace(s, '(?m)^ *(-{3,}|\*{3,}) *$', '', 'g') AS s FROM s8)
        |SELECT doc_id,
        |  trim(regexp_replace(s, '\n{3,}', chr(10) || chr(10), 'g')) AS md_text,
        |  CAST(len(regexp_extract_all(text, '(?s)```.*?```')) AS BIGINT) AS n_code_blocks,
        |  CAST(len(regexp_extract_all(text, '!\[[^\]]*\]\([^)]*\)')) AS BIGINT) AS n_images,
        |  CAST(len(regexp_extract_all(text, '\[[^\]]*\]\([^)]*\)'))
        |       - len(regexp_extract_all(text, '!\[[^\]]*\]\([^)]*\)')) AS BIGINT) AS n_links,
        |  CAST(len(regexp_extract_all(text, '(?m)^#{1,6} ')) AS BIGINT) AS n_headers
        |FROM s9 ORDER BY doc_id""".stripMargin,
    "d_weighted_sample" ->
      // the same A-ES arithmetic: u from the first 12 md5 hex digits
      // (48-bit integer — exact in a double), key = ln(u)/w at 12 dp,
      // top-k by (key desc, id)
      """WITH w AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS weight
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, weight,
        |    round(ln((CAST(('0x' || substring(md5('ws0|' || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT) + 0.5)
        |             / 281474976710656.0) / weight, 12) AS key
        |  FROM w)
        |SELECT doc_id, weight FROM (
        |  SELECT doc_id, weight FROM k ORDER BY key DESC, doc_id LIMIT 200)
        |ORDER BY doc_id""".stripMargin,
    "q_sync_deletes" ->
      // deleted-at-source = %97 keys; the alien +5000000 keys are NEW
      // at the source and must NOT surface as tombstones
      """SELECT * FROM orders WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_data_quality" ->
      // every rule replayed: NULL assertions count as violations
      // (NOT coalesce(p, FALSE)), uniqueness = rows minus distinct
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
        |v AS (
        |  SELECT 'orderkey_not_null' AS rule,
        |    CAST(sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM orders
        |  UNION ALL SELECT 'price_positive',
        |    CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'price_above_1000',
        |    CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 1000, FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'status_accepted',
        |    CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'date_in_range',
        |    CAST(sum(CASE WHEN NOT coalesce(o_orderdate BETWEEN TIMESTAMP '1992-01-01 00:00:00' AND TIMESTAMP '1998-12-31 23:59:59', FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'orderkey_unique',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'custkey_unique',
        |    CAST(count(*) - count(DISTINCT o_custkey) AS BIGINT) FROM orders)
        |SELECT rule, n_rows, n_violations,
        |  CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE) AS violation_rate,
        |  n_violations = 0 AS pass
        |FROM v CROSS JOIN n ORDER BY rule""".stripMargin,
    "q_json_extract" ->
      // json_valid guard mirrors get_json_object's null-on-malformed
      // totality (DuckDB's raw extraction throws instead)
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN json_valid(props)
        |           THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS BIGINT) AS sum_k,
        |  min(CASE WHEN json_valid(props)
        |           THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS min_k,
        |  max(CASE WHEN json_valid(props)
        |           THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS max_k,
        |  CAST(count(CASE WHEN json_valid(props)
        |             THEN json_extract_string(props, '$.nope') END) AS BIGINT) AS n_absent_nonnull
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_time_weighted_avg" ->
      // the same LOCF step weighting: exact microsecond durations,
      // IEEE products summed by an ORDERED fold (list ORDER BY ts,
      // event_id + list_sum — the d_domain_mix_temp convention;
      // distributed partial-agg double sums are not engine-stable),
      // unrounded final quotient
      """WITH d AS (
        |  SELECT user_id, ts, event_id, value,
        |    coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |             - epoch_us(ts), 0) AS dur
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(dur) AS DOUBLE) / 1000000.0 AS span_seconds,
        |  CASE WHEN sum(dur) > 0
        |       THEN list_sum(list(value * dur ORDER BY ts, event_id))
        |            / CAST(sum(dur) AS DOUBLE)
        |       ELSE list_sum(list(value ORDER BY ts, event_id)) / count(*) END AS twa
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_cdc_apply" ->
      // final state per key from the planted op arithmetic: ver-3
      // re-update beats the ver-2 delete, deletes drop, inserts add
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |    CASE WHEN o_orderkey % 13 = 0 THEN 'CDC-UPD2'
        |         WHEN o_orderkey % 7 = 0 THEN 'CDC-UPD'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders
        |  WHERE o_orderkey % 13 = 0 OR o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 6000000, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, 'CDC-NEW'
        |  FROM orders WHERE o_orderkey % 17 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q_scd2_history" ->
      // the same two-window gaps-and-islands arithmetic: a version
      // opens where the null-safe attribute comparison breaks
      """WITH pts AS (
        |  SELECT user_id, event_type, ts, event_id FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM events) t
        |  WHERE prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM pts ORDER BY user_id, valid_from, event_type""".stripMargin,
    "q_scd2_delta" ->
      // delta == one-shot: the q_scd2_history oracle verbatim
      """WITH pts AS (
        |  SELECT user_id, event_type, ts, event_id FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM events) t
        |  WHERE prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM pts ORDER BY user_id, valid_from, event_type""".stripMargin,
    "d_sentences" ->
      // indexed-lambda punctuation planting (DuckDB i is 1-based ==
      // Spark's i+1), then the same lookbehind-free extraction
      """WITH t AS (
        |  SELECT doc_id, array_to_string(list_transform(string_split(text, ' '), (w, i) ->
        |    CASE WHEN i % 17 = 0 THEN w || '!'
        |         WHEN i % 7 = 0 THEN w || '.'
        |         ELSE w END), ' ') AS text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, list_filter(list_transform(
        |    regexp_extract_all(text, '[^.!?]+[.!?]*'), x -> trim(x)), x -> x <> '') AS l
        |  FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS sent_id, l[i] AS sentence,
        |  CAST(len(string_split(l[i], ' ')) AS BIGINT) AS n_words
        |FROM s, UNNEST(range(1, len(l) + 1)) u(i)
        |ORDER BY doc_id, sent_id""".stripMargin,
    "d_embed_truncate" ->
      """SELECT vec_id,
        |  round(sqrt(list_dot_product(v, v)), 6) AS norm_full,
        |  round(sqrt(list_dot_product(v[1:16], v[1:16])), 6) AS norm_trunc,
        |  round(sqrt(list_dot_product(v[1:16], v[1:16])) / sqrt(list_dot_product(v, v)), 6) AS frac_norm
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "d_unicode_normalize" ->
      // same planted decomposed pairs via chr() arithmetic; both
      // engines implement UAX#15 NFC (utf8proc vs java.text), so the
      // normalized text hash-matches byte for byte
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text
        |    ELSE text || ' x' ||
        |         substring('aeon', CAST(doc_id % 4 AS INT) + 1, 1) ||
        |         chr(CAST(768 + doc_id % 4 AS INT)) END AS text
        |  FROM documents)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
        |  nfc_normalize(text) AS text_nfc,
        |  CAST(length(nfc_normalize(text)) AS BIGINT) AS nfc_len,
        |  length(nfc_normalize(text)) <> length(text) AS changed
        |FROM t ORDER BY doc_id""".stripMargin,
    "d_split_assign" ->
      // the same md5 bucket recipe as d_sample_portable against
      // half-open 80/10/10 ranges
      """SELECT doc_id, lang,
        |  CASE WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 800000 THEN 'train'
        |       WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_split_leakage" ->
      // pair CTE = the d_dedup_clusters_sql chain recipe at one
      // mutation level; split labels = the d_split_assign arithmetic
      // applied to both endpoints; crossing pairs only
      """WITH copies AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, array_to_string((string_split(text, ' '))[4:], ' ') FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')) - 3, 0) + 2),
        |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingles
        |  FROM copies
        |), chain AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 10000
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        |), lab AS (
        |  SELECT doc_a, doc_b,
        |    CASE WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_a AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 800000 THEN 'train'
        |         WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_a AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 900000 THEN 'val'
        |         ELSE 'test' END AS split_a,
        |    CASE WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_b AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 800000 THEN 'train'
        |         WHEN CAST(('0x' || substring(md5('split|' || CAST(doc_b AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 < 900000 THEN 'val'
        |         ELSE 'test' END AS split_b
        |  FROM chain)
        |SELECT doc_a, doc_b, split_a, split_b FROM lab
        |WHERE split_a <> split_b ORDER BY doc_a""".stripMargin,
    "d_link_components" ->
      // chains within a source are one component; the representative
      // is the component's lexicographic min node — a plain window
      // min per source, no graph walk needed
      """SELECT source || '/' || doc_id AS n,
        |  min(source || '/' || doc_id) OVER (PARTITION BY source) AS component
        |FROM documents ORDER BY n""".stripMargin,
    "d_hits" ->
      // the engine's 3 iterations unrolled: phase sums of 9dp scores
      // as DECIMAL(30,12) (exact), L1-normalize round(raw/total, 9),
      // 6dp emit — the same determinism contract as d_domain_rank
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |h0 AS (SELECT n, 1.0 AS x FROM nodes),
        |a1r AS (SELECT e.dst AS n, sum(CAST(round(h0.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN h0 ON e.src = h0.n GROUP BY e.dst),
        |a1 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM a1r), 9) AS x
        |  FROM nodes LEFT JOIN a1r ON nodes.n = a1r.n),
        |h1r AS (SELECT e.src AS n, sum(CAST(round(a1.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN a1 ON e.dst = a1.n GROUP BY e.src),
        |h1 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM h1r), 9) AS x
        |  FROM nodes LEFT JOIN h1r ON nodes.n = h1r.n),
        |a2r AS (SELECT e.dst AS n, sum(CAST(round(h1.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN h1 ON e.src = h1.n GROUP BY e.dst),
        |a2 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM a2r), 9) AS x
        |  FROM nodes LEFT JOIN a2r ON nodes.n = a2r.n),
        |h2r AS (SELECT e.src AS n, sum(CAST(round(a2.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN a2 ON e.dst = a2.n GROUP BY e.src),
        |h2 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM h2r), 9) AS x
        |  FROM nodes LEFT JOIN h2r ON nodes.n = h2r.n),
        |a3r AS (SELECT e.dst AS n, sum(CAST(round(h2.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN h2 ON e.src = h2.n GROUP BY e.dst),
        |a3 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM a3r), 9) AS x
        |  FROM nodes LEFT JOIN a3r ON nodes.n = a3r.n),
        |h3r AS (SELECT e.src AS n, sum(CAST(round(a3.x, 9) AS DECIMAL(30,12))) AS r
        |  FROM edges e JOIN a3 ON e.dst = a3.n GROUP BY e.src),
        |h3 AS (SELECT nodes.n, round(COALESCE(CAST(r AS DOUBLE), 0.0)
        |    / (SELECT CAST(sum(r) AS DOUBLE) FROM h3r), 9) AS x
        |  FROM nodes LEFT JOIN h3r ON nodes.n = h3r.n)
        |SELECT h3.n, round(h3.x, 6) AS hub, round(a3.x, 6) AS authority
        |FROM h3 JOIN a3 ON h3.n = a3.n ORDER BY h3.n""".stripMargin,
    "d_harmonic" ->
      // min-distances via a recursive walk (bounded by dist < 4 before
      // the +1 step), harmonic = per-pair round(1/dist, 9) decimal sum
      // — the engine's per-ring delta/t accumulation must equal it
      """WITH RECURSIVE s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s),
        |walk AS (
        |  SELECT src, dst, 1 AS dist FROM edges
        |  UNION ALL
        |  SELECT w.src, e.dst, w.dist + 1
        |  FROM walk w JOIN edges e ON w.dst = e.src WHERE w.dist < 4),
        |pairs AS (SELECT src, dst, min(dist) AS dist FROM walk
        |  WHERE src <> dst GROUP BY src, dst)
        |SELECT dst AS n, CAST(count(*) AS BIGINT) AS n_reachable,
        |  round(CAST(sum(CAST(round(1.0 / dist, 9) AS DECIMAL(30,12))) AS DOUBLE), 6) AS harmonic
        |FROM pairs GROUP BY dst ORDER BY n""".stripMargin,
    "d_url_percent" ->
      // expected: %41/%61/%7e decoded (unreserved), %2f kept uppercase
      // (reserved '/'), %g1 literal; then scheme/host lowercase, www +
      // default port stripped
      """SELECT doc_id,
        |  'https://example-' || source || '.com/path%2Fdoc/' || doc_id
        |    || '?id=%2Fv~&x=%g1' AS url
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_robots_filter" ->
      // expected verdicts rebuilt from the synthesis arithmetic: no
      // robots row (every 3rd source) allows everything; otherwise
      // open (/doc/) and the allow-override (/private/public/) pass,
      // /private/ and the $-anchored *.pdf rule block
      """SELECT doc_id,
        |  'https://' || source || '.example.com' ||
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN '/doc/' || doc_id
        |      WHEN 1 THEN '/private/' || doc_id
        |      WHEN 2 THEN '/private/public/' || doc_id
        |      ELSE '/files/' || doc_id || '.pdf' END AS url,
        |  (CAST(substr(source, 4) AS INT) % 3 = 0)
        |    OR (CAST(doc_id % 4 AS INT) IN (0, 2)) AS allowed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_url_psl" ->
      // expected registered domains rebuilt from doc_id/source by the
      // documented longest-match / wildcard / exception-priority
      // rules, independent of the join plan
      """SELECT doc_id,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 0 THEN 'pages.user-' || source || '.github.io'
        |    WHEN 1 THEN 'shop.' || source || '.de.com'
        |    WHEN 2 THEN 'news.archive.' || source || '.co.uk'
        |    WHEN 3 THEN 'x.y.' || source || '.test'
        |    WHEN 4 THEN 'a.b.' || source || '.ck'
        |    ELSE 'deep.www.ck' END AS host,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 0 THEN 'user-' || source || '.github.io'
        |    WHEN 1 THEN source || '.de.com'
        |    WHEN 2 THEN source || '.co.uk'
        |    WHEN 3 THEN source || '.test'
        |    WHEN 4 THEN 'b.' || source || '.ck'
        |    ELSE 'www.ck' END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_crawl_charset" ->
      // expected decoded text rebuilt with chr() codepoints: é =
      // U+00E9 (arrived as Latin-1 0xE9, header-declared), テ =
      // U+30C6 (arrived as Shift-JIS 0x83 0x65, meta-declared),
      // ✓ = U+2713 (arrived as UTF-8, undeclared default). Each
      // suffix adds exactly one whitespace token.
      """SELECT 'https://cs.example/doc/' || doc_id AS url,
        |  text || CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN ' caf' || chr(233)
        |    WHEN 1 THEN ' ' || chr(12486)
        |    ELSE ' ' || chr(10003) END AS text,
        |  CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tokens
        |FROM documents ORDER BY url""".stripMargin,
    "d_url_domain_stats" ->
      """WITH u AS (
        |  SELECT CASE WHEN doc_id % 5 = 0 THEN source || '.co.uk'
        |    ELSE 'example-' || source || '.com' END AS domain,
        |    len(text) AS c
        |  FROM documents)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(c) AS BIGINT) AS n_chars
        |FROM u GROUP BY domain ORDER BY domain""".stripMargin,
    "d_vocab_topk" ->
      """WITH f AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token),
        |tot AS (SELECT sum(cnt) AS total FROM f),
        |top AS (
        |  SELECT token, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT) AS rank
        |  FROM f ORDER BY cnt DESC, token ASC LIMIT 200)
        |SELECT rank, token, cnt,
        |  round(CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
        |    AS DOUBLE) / total, 6) AS cum_coverage
        |FROM top CROSS JOIN tot ORDER BY rank""".stripMargin,
    "d_bpe_pair_counts" ->
      // BPE trainer round 0: freq-weighted adjacent symbol pairs over
      // the word-frequency table (chars + terminal </w>); parallel
      // slice-unnest zips the pair columns (bigram-oracle shape)
      """WITH w AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word),
        |s AS (SELECT freq, list_append(string_split(word, ''), '</w>') AS syms FROM w),
        |p AS (SELECT freq, unnest(syms[1:len(syms)-1]) AS a,
        |             unnest(syms[2:len(syms)]) AS b FROM s)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY a, b ORDER BY cnt DESC, a ASC, b ASC LIMIT 200""".stripMargin,
    "d_gopher_rules" ->
      // all ratios are exact int/int IEEE divisions rounded to 6dp;
      // '/' on integers is double division in BOTH engines, and the
      // ellipsis count difference is always a multiple of 3
      """WITH d AS (
        |  SELECT doc_id, text AS t,
        |    string_split(text, ' ') AS w,
        |    string_split(text, chr(10)) AS l
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
        |      / len(w), 6) AS mean_word_len,
        |    round(CAST((length(t) - length(replace(t, '#', '')))
        |      + (length(t) - length(replace(t, '...', ''))) / 3 AS DOUBLE)
        |      / len(w), 6) AS symbol_ratio,
        |    round(CAST(len(list_filter(l, x ->
        |        x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %')) AS DOUBLE)
        |      / len(l), 6) AS bullet_line_frac,
        |    round(CAST(len(list_filter(l, x -> right(x, 3) = '...')) AS DOUBLE)
        |      / len(l), 6) AS ellipsis_line_frac,
        |    round(CAST(len(list_filter(w, x ->
        |        regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w), 6) AS alpha_word_frac,
        |    CAST(list_contains(w, 'the') AS BIGINT) + CAST(list_contains(w, 'be') AS BIGINT)
        |      + CAST(list_contains(w, 'to') AS BIGINT) + CAST(list_contains(w, 'of') AS BIGINT)
        |      + CAST(list_contains(w, 'and') AS BIGINT) + CAST(list_contains(w, 'that') AS BIGINT)
        |      + CAST(list_contains(w, 'have') AS BIGINT) + CAST(list_contains(w, 'with') AS BIGINT)
        |      AS n_stopwords_present
        |  FROM d)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
        |  ellipsis_line_frac, alpha_word_frac, n_stopwords_present,
        |  (n_words BETWEEN 10 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |   AND n_stopwords_present >= 2) AS pass
        |FROM sig ORDER BY doc_id""".stripMargin,
    "d_html_extract" ->
      // expected output reconstructed from the RAW text, not by
      // mirroring the extractor: the page wraps text in 6 blocks (nav,
      // heading, <p>text</p>, <p>See <a>the reference</a> for
      // details: UPPER</p>, an entity-bearing <p>, footer).
      // nav/heading/footer always drop (link-dense / short). Block 3
      // keeps iff len >= 20 (minChars) — and only EXISTS when text is
      // non-empty (the extractor filters empty blocks before counting,
      // hence the len(text) > 0 term in the block total; the remaining
      // corpus invariants this arithmetic leans on — markup-free,
      // single-spaced text — are asserted by the harness corpus).
      // Block 4's visible text is 31 + L chars, its anchor text
      // contributes 14 of them after whitespace collapse, so it keeps
      // iff 14/(31+L) <= 0.2 — the same IEEE division both engines
      // run. Block 5 carries numeric character references; its decoded
      // 30-char anchor-free text always keeps, and the expected string
      // is rebuilt here from chr() codepoints, independent of the
      // engine's decoder.
      """SELECT doc_id,
        |  concat_ws(chr(10),
        |    CASE WHEN len(text) >= 20 THEN text END,
        |    CASE WHEN 14.0 / (31 + len(text)) <= 0.2
        |         THEN 'See the reference for details: ' || upper(text) END,
        |    'It' || chr(8217) || 's 5 < 7 &amp; fine ' || chr(8212) || ' really') AS text,
        |  CAST(1 + CASE WHEN len(text) >= 20 THEN 1 ELSE 0 END
        |     + CASE WHEN 14.0 / (31 + len(text)) <= 0.2 THEN 1 ELSE 0 END
        |     AS BIGINT) AS n_blocks_kept,
        |  CAST(5 + CASE WHEN len(text) > 0 THEN 1 ELSE 0 END
        |     - 1 - CASE WHEN len(text) >= 20 THEN 1 ELSE 0 END
        |     - CASE WHEN 14.0 / (31 + len(text)) <= 0.2 THEN 1 ELSE 0 END
        |     AS BIGINT) AS n_blocks_dropped
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_char_entropy" ->
      // per-doc char histogram via unnest+groupBy (fine at oracle
      // scale; the Spark side builds it per row without a shuffle)
      // LEFT JOINs + COALESCE mirror the Spark side's empty-text guard
      // (charEntropy emits (id, 0, 0, 0.0) for a zero-length doc; an
      // INNER JOIN would drop the row and divide by zero) — the n > 0
      // guard keeps the division edge out even though hist is already
      // empty for an empty doc
      """WITH hist AS (
        |  SELECT doc_id, ch, count(*) AS cnt FROM (
        |    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        |    WHERE length(text) > 0)
        |  GROUP BY doc_id, ch),
        |docn AS (SELECT doc_id, length(text) AS n FROM documents),
        |terms AS (
        |  SELECT h.doc_id,
        |    CAST(round((h.cnt / CAST(d.n AS DOUBLE))
        |      * log2(h.cnt / CAST(d.n AS DOUBLE)), 9) AS DECIMAL(30,12)) AS t
        |  FROM hist h JOIN docn d USING (doc_id) WHERE d.n > 0),
        |uniq AS (SELECT doc_id, count(*) AS n_unique_chars FROM hist GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
        |  COALESCE(u.n_unique_chars, 0) AS n_unique_chars,
        |  COALESCE(round(CAST(-sum(t.t) AS DOUBLE), 6), 0.0) AS entropy
        |FROM docn d LEFT JOIN uniq u USING (doc_id) LEFT JOIN terms t USING (doc_id)
        |GROUP BY d.doc_id, d.n, u.n_unique_chars ORDER BY doc_id""".stripMargin,
    "d_bigram_logprob" ->
      // parallel unnest of the two word-array slices zips them into
      // aligned (a, b) bigram rows — DuckDB's unnest-in-SELECT zip
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pairs AS (SELECT doc_id,
        |  unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM toks),
        |big AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
        |ctx AS (SELECT a, sum(c_ab) AS c_a FROM big GROUP BY 1),
        |nxt AS (SELECT b, sum(c_ab) AS c_b FROM big GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS t FROM big),
        |model AS (SELECT a, b,
        |  CAST(round(ln(0.75 * (CAST(c_ab AS DOUBLE) / c_a) +
        |    0.25 * (CAST(c_b AS DOUBLE) / t)), 9) AS DECIMAL(30,12)) AS logp
        |  FROM big JOIN ctx USING (a) JOIN nxt USING (b) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp
        |FROM pairs JOIN model USING (a, b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_kneser_ney" ->
      // interpolated Kneser-Ney replayed: absolute discount D = 0.75
      // (exact in binary — no ulp hazard), continuation counts =
      // distinct bigram TYPES per word (count(*) over the bigram
      // table), same IEEE op order as the engine
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pairs AS (SELECT doc_id,
        |  unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM toks),
        |big AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
        |ctx AS (SELECT a, sum(c_ab) AS c_a, count(*) AS n1a FROM big GROUP BY 1),
        |nxt AS (SELECT b, count(*) AS n1b FROM big GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS np FROM big),
        |model AS (SELECT a, b,
        |  CAST(round(ln(greatest(CAST(c_ab AS DOUBLE) - 0.75, 0.0) / c_a +
        |    0.75 * (CAST(n1a AS DOUBLE) / c_a) * (CAST(n1b AS DOUBLE) / np)), 9) AS DECIMAL(30,12)) AS logp
        |  FROM big JOIN ctx USING (a) JOIN nxt USING (b) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp
        |FROM pairs JOIN model USING (a, b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_kneser_ney3" ->
      // order-3 interpolated KN replayed level by level: trigram
      // absolute discounting, bigram CONTINUATION counts (distinct
      // left contexts per (b,c) = rows of the trigram-type table),
      // unigram continuation over bigram types — same IEEE op order
      // and 9dp/exact-decimal/6dp ladder as the engine
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tris AS (SELECT doc_id,
        |  unnest(w[1:greatest(len(w)-2, 0)]) AS a,
        |  unnest(w[2:greatest(len(w)-1, 0)]) AS b,
        |  unnest(w[3:len(w)]) AS c FROM toks),
        |tri AS (SELECT a, b, c, count(*) AS c_abc FROM tris GROUP BY 1, 2, 3),
        |ctx AS (SELECT a, b, sum(c_abc) AS c_ab, count(*) AS n1_ab FROM tri GROUP BY 1, 2),
        |bt AS (SELECT b, c, count(*) AS n1_bc FROM tri GROUP BY 1, 2),
        |mid AS (SELECT b, sum(n1_bc) AS n1_mb, count(*) AS nt_b FROM bt GROUP BY 1),
        |uni AS (SELECT c, count(*) AS n1_c FROM bt GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM bt),
        |model AS (SELECT a, b, c,
        |  CAST(round(ln(greatest(CAST(c_abc AS DOUBLE) - 0.75, 0.0) / c_ab +
        |    0.75 * (CAST(n1_ab AS DOUBLE) / c_ab) *
        |      (greatest(CAST(n1_bc AS DOUBLE) - 0.75, 0.0) / n1_mb +
        |        0.75 * (CAST(nt_b AS DOUBLE) / n1_mb) * (CAST(n1_c AS DOUBLE) / nb))), 9) AS DECIMAL(30,12)) AS logp
        |  FROM tri JOIN ctx USING (a, b) JOIN bt USING (b, c)
        |  JOIN mid USING (b) JOIN uni USING (c) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp
        |FROM tris JOIN model USING (a, b, c)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_scc" ->
      // SCCs recomputed from first principles: recursive-CTE
      // transitive closure over the same pairs-chained construction,
      // SCC = mutual-reachability class, label = min member — fully
      // independent of the engine's FW-BW coloring algebra
      """WITH RECURSIVE s AS (SELECT DISTINCT source FROM documents),
        |r AS (SELECT source, row_number() OVER (ORDER BY source) AS rn FROM s),
        |nx AS (SELECT a.source AS src, a.rn, b.source AS nxt
        |  FROM r a LEFT JOIN r b ON b.rn = a.rn + 1),
        |pe AS (
        |  SELECT src, nxt AS dst FROM nx WHERE rn % 2 = 1 AND nxt IS NOT NULL
        |  UNION ALL
        |  SELECT nxt, src FROM nx WHERE rn % 2 = 1 AND nxt IS NOT NULL
        |  UNION ALL
        |  SELECT nxt, src FROM nx WHERE rn % 2 = 0 AND nxt IS NOT NULL
        |  UNION ALL
        |  SELECT source, 'hub.example' FROM s),
        |edges AS (SELECT DISTINCT src, dst FROM pe),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |reach AS (SELECT src AS a, dst AS b FROM edges
        |  UNION SELECT reach.a, e.dst FROM reach JOIN edges e ON reach.b = e.src),
        |mutual AS (SELECT n AS a, n AS b FROM nodes
        |  UNION SELECT r1.a, r1.b FROM reach r1
        |    JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
        |SELECT a AS n, min(b) AS scc FROM mutual GROUP BY a
        |ORDER BY scc, n""".stripMargin,
    "d_graph_bowtie" ->
      // bow-tie classes recomputed from first principles over the
      // recursive-CTE closure: core = largest SCC (min label ties),
      // in/out = closure to/from core, tube/tendril = closure
      // from-IN / to-OUT over the residue — CASE order mirrors the
      // engine's precedence
      """WITH RECURSIVE s AS (SELECT DISTINCT source FROM documents),
        |r AS (SELECT source, row_number() OVER (ORDER BY source) AS rn,
        |  LEAD(source) OVER (ORDER BY source) AS nxt,
        |  (SELECT min(source) FROM s) AS s1 FROM s),
        |pe AS (
        |  SELECT source AS src, nxt AS dst FROM r WHERE rn IN (1, 2) AND nxt IS NOT NULL
        |  UNION ALL SELECT source, s1 FROM r WHERE rn = 3
        |  UNION ALL SELECT source, (SELECT source FROM r WHERE rn = 3) FROM r WHERE rn >= 4
        |  UNION ALL SELECT source, 'hub.example' FROM r WHERE rn = 1
        |  UNION ALL SELECT source, 'tendril.example' FROM r WHERE rn = 5
        |  UNION ALL SELECT source, 'tube.example' FROM r WHERE rn = 6
        |  UNION ALL SELECT 'tube.example', 'hub.example'
        |  UNION ALL SELECT 'iso1.example', 'iso2.example'
        |  UNION ALL SELECT 'iso2.example', 'iso1.example'),
        |edges AS (SELECT DISTINCT src, dst FROM pe WHERE src <> dst),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |reach AS (SELECT src AS a, dst AS b FROM edges
        |  UNION SELECT reach.a, e.dst FROM reach JOIN edges e ON reach.b = e.src),
        |mutual AS (SELECT n AS a, n AS b FROM nodes
        |  UNION SELECT r1.a, r1.b FROM reach r1
        |    JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
        |sccs AS (SELECT a AS n, min(b) AS scc FROM mutual GROUP BY a),
        |core AS (SELECT n FROM sccs WHERE scc = (
        |  SELECT scc FROM (SELECT scc, count(*) AS sz FROM sccs GROUP BY scc)
        |  ORDER BY sz DESC, scc LIMIT 1)),
        |ins AS (SELECT DISTINCT r1.a AS n FROM reach r1 JOIN core c ON r1.b = c.n
        |  WHERE r1.a NOT IN (SELECT n FROM core)),
        |outs AS (SELECT DISTINCT r1.b AS n FROM reach r1 JOIN core c ON r1.a = c.n
        |  WHERE r1.b NOT IN (SELECT n FROM core)),
        |iff AS (SELECT DISTINCT r1.b AS n FROM reach r1 JOIN ins i ON r1.a = i.n),
        |obb AS (SELECT DISTINCT r1.a AS n FROM reach r1 JOIN outs o ON r1.b = o.n)
        |SELECT n,
        |  CASE WHEN n IN (SELECT n FROM core) THEN 'core'
        |       WHEN n IN (SELECT n FROM ins) THEN 'in'
        |       WHEN n IN (SELECT n FROM outs) THEN 'out'
        |       WHEN n IN (SELECT n FROM iff) AND n IN (SELECT n FROM obb) THEN 'tube'
        |       WHEN n IN (SELECT n FROM iff) OR n IN (SELECT n FROM obb) THEN 'tendril'
        |       ELSE 'disconnected' END AS cls
        |FROM nodes ORDER BY cls, n""".stripMargin,
    "d_graph_stats" ->
      // every statistic recomputed from the same ring+hub+reversed
      // edge construction; count(*) is BIGINT in DuckDB, the CASE
      // sum casts explicitly
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |ring AS (SELECT source AS src,
        |    COALESCE(LEAD(source) OVER (ORDER BY source),
        |             (SELECT min(source) FROM s)) AS dst FROM s),
        |rev AS (SELECT dst AS src, src AS dst FROM ring WHERE length(src) % 2 = 0),
        |edges AS (SELECT src, dst FROM ring
        |  UNION SELECT source, 'hub.example' FROM s
        |  UNION SELECT src, dst FROM rev),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
        |ec AS (SELECT count(*) AS n_edges,
        |  CAST(sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS n_self_loops
        |  FROM edges),
        |nc AS (SELECT count(*) AS n_nodes FROM nodes),
        |dc AS (SELECT count(*) AS n_dangling FROM nodes
        |  WHERE n NOT IN (SELECT src FROM edges)),
        |rc AS (SELECT count(*) AS recip FROM edges e
        |  WHERE e.src <> e.dst AND EXISTS (
        |    SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src))
        |SELECT n_nodes, n_edges, n_self_loops, n_dangling,
        |  round(CAST(recip AS DOUBLE) / CAST(greatest(n_edges - n_self_loops, 1) AS DOUBLE), 6) AS reciprocity,
        |  round(CAST(n_edges AS DOUBLE) / greatest(n_nodes, 1), 6) AS avg_out_degree
        |FROM ec, nc, dc, rc""".stripMargin,
    "m_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS payload_bytes,
        |  CAST(64 + (doc_id % 16) * 8 AS INT) AS width,
        |  CAST(48 + (doc_id % 12) * 8 AS INT) AS height,
        |  md5(text) AS feature_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m_resize" ->
      """SELECT doc_id, width, height,
        |  CASE WHEN width * 96 <= height * 128 THEN CAST(FLOOR(width * 96.0 / height) AS INT) ELSE 128 END AS out_w,
        |  CASE WHEN width * 96 <= height * 128 THEN 96 ELSE CAST(FLOOR(height * 128.0 / width) AS INT) END AS out_h
        |FROM (
        |  SELECT doc_id,
        |    CAST(64 + (doc_id % 16) * 8 AS INT) AS width,
        |    CAST(48 + (doc_id % 12) * 8 AS INT) AS height
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 0) t
        |ORDER BY doc_id""".stripMargin,
    "m_frame_sample" ->
      """SELECT doc_id, CAST((doc_id % 30 + 1) * 1000 AS INT) AS duration_ms,
        |  CAST(doc_id % 30 + 1 AS INT) AS n_frames
        |FROM documents WHERE CAST(doc_id % 3 AS INT) = 2 ORDER BY doc_id""".stripMargin,
    "d_audio_clipping" ->
      // chr(254) = 'þ' round-trips UTF-8 as ONE code point, so the
      // stub sample stream is text ++ pinned-run ++ text in both
      // engines; peak/clip/RMS replay over ascii() lists
      """WITH audio AS (
        |  SELECT doc_id,
        |    text || repeat(chr(254), CAST(doc_id % 9 AS INT)) || text AS t
        |  FROM documents),
        |codes AS (
        |  SELECT doc_id, list_transform(string_split(t, ''), c -> ascii(c)) AS cs
        |  FROM audio)
        |SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_samples,
        |  CAST(list_max(cs) AS BIGINT) AS peak,
        |  CAST(list_sum(list_transform(cs, x -> CASE WHEN x >= 250 THEN 1 ELSE 0 END)) AS BIGINT) AS n_clipped,
        |  round(CAST(list_sum(list_transform(cs, x -> CASE WHEN x >= 250 THEN 1 ELSE 0 END)) AS DOUBLE) / len(cs), 6) AS clip_frac,
        |  round(sqrt(CAST(list_sum(list_transform(cs, x -> CAST(x AS BIGINT) * x)) AS DOUBLE) / len(cs)), 6) AS rms
        |FROM codes ORDER BY doc_id""".stripMargin,
    "d_vad_segments" ->
      // the m_audio_energy frame CTEs over the silence-injected
      // payload, then the identical gaps-and-islands arithmetic:
      // island key = frame_id - per-(doc, activity) row number
      """WITH audio AS (
        |  SELECT doc_id, text || repeat(chr(1), 64) || text AS pcm FROM documents),
        |codes AS (
        |  SELECT doc_id, list_transform(string_split(pcm, ''), c -> ascii(c)) AS cs
        |  FROM audio),
        |frames AS (
        |  SELECT doc_id, CAST(g - 1 AS BIGINT) AS frame_id,
        |    cs[(g - 1) * 64 + 1 : g * 64] AS f
        |  FROM codes, UNNEST(range(1, CAST(ceil(len(cs) / 64.0) AS BIGINT) + 1)) t(g)),
        |rmsf AS (
        |  SELECT doc_id, frame_id,
        |    round(sqrt(CAST(list_sum(list_transform(f, x -> CAST(x AS BIGINT) * x)) AS DOUBLE)
        |      / len(f)), 6) AS rms
        |  FROM frames),
        |isl AS (
        |  SELECT doc_id, frame_id, rms, rms >= 50.0 AS active,
        |    frame_id - ROW_NUMBER() OVER (PARTITION BY doc_id, rms >= 50.0
        |      ORDER BY frame_id) AS k
        |  FROM rmsf),
        |seg AS (
        |  SELECT doc_id, min(frame_id) AS start_frame, max(frame_id) AS end_frame,
        |    CAST(count(*) AS BIGINT) AS n_frames,
        |    round(CAST(sum(CAST(rms AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS mean_rms
        |  FROM isl WHERE active GROUP BY doc_id, k)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 AS BIGINT) AS seg_id,
        |  start_frame, end_frame, n_frames, mean_rms
        |FROM seg ORDER BY doc_id, seg_id""".stripMargin,
    "d_shot_detect" ->
      // the engine's lumas are decoded pixels; the oracle knows them
      // from arithmetic (gray g => mean luma exactly g) and replays
      // the lag/threshold window: boundaries at frame 0 (no
      // predecessor) and frame 2 (jump 200-(g+5) >= 95 >= 50)
      """WITH f AS (
        |  SELECT doc_id, 0 AS i, CAST(doc_id % 100 AS DOUBLE) AS luma FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, CAST(doc_id % 100 + 5 AS DOUBLE) FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, CAST(200 AS DOUBLE) FROM documents
        |  UNION ALL
        |  SELECT doc_id, 3, CAST(205 AS DOUBLE) FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, luma,
        |  (i = 0 OR i = 2) AS is_boundary,
        |  CAST(CASE WHEN i < 2 THEN 0 ELSE 1 END AS BIGINT) AS shot_id
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m_frame_sample_decoded" ->
      // expected per-frame facts from doc_id alone: frame 0 is gray
      // g = id % 256 (mean luma EXACTLY g — Rec.601 coefficients sum
      // to 1000), frame 1 is 255 - g; dims 4+id%4 x 3+id%3; the
      // engine's values come from really-decoded GIF rasters
      """WITH f AS (
        |  SELECT doc_id, 0 AS frame_idx, doc_id % 256 AS g FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, 255 - doc_id % 256 FROM documents)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(2 AS BIGINT) AS n_frames,
        |  CAST(4 + doc_id % 4 AS INT) AS width,
        |  CAST(3 + doc_id % 3 AS INT) AS height,
        |  'luma:' || CAST(g AS VARCHAR) || '.000000' AS feature
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m_image_dhash" ->
      // the 9x8 planted image makes the thumbnail sample the
      // identity; gray g has luma exactly g, so dHash bit (y*8+x) =
      // [g(x+1,y) > g(x,y)] from arithmetic alone. MSB-first: nibble
      // ni = bit//4, in-nibble weight 8/4/2/1
      """WITH px AS (
        |  SELECT doc_id, y, x, (doc_id*37 + y*9 + x*13) % 256 AS g
        |  FROM documents, range(8) t(y), range(9) u(x)
        |), bits AS (
        |  SELECT a.doc_id, a.y*8 + a.x AS bi,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |), nib AS (
        |  SELECT doc_id, bi // 4 AS ni,
        |    sum(bit * CASE bi % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END) AS v
        |  FROM bits GROUP BY doc_id, bi // 4
        |)
        |SELECT doc_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |  string_agg(substring('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY ni) AS dhash
        |FROM nib GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "m_image_dedup" ->
      // same bit arithmetic over base + perturbed copies, then the
      // engine's own pigeonhole scheme: 4 bands of 4 hex chars for
      // candidates, exact bit-diff count as verification — the
      // verify step makes the pair set banding-independent
      """WITH ids AS (
        |  SELECT doc_id, 0 AS pert FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, 1 FROM documents
        |), px AS (
        |  SELECT i.doc_id, y, x,
        |    (CAST(('0x' || substring(md5(CAST(i.doc_id - 10000*pert AS VARCHAR) || ':' || CAST(y*9 + x AS VARCHAR)), 1, 2)) AS INT) +
        |     CASE WHEN pert = 1 AND y = 0 AND x = 4 THEN 101 ELSE 0 END) % 256 AS g
        |  FROM ids i, range(8) t(y), range(9) u(x)
        |), bits AS (
        |  SELECT a.doc_id, a.y*8 + a.x AS bi,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |), nib AS (
        |  SELECT doc_id, bi // 4 AS ni,
        |    sum(bit * CASE bi % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END) AS v
        |  FROM bits GROUP BY doc_id, bi // 4
        |), hex AS (
        |  SELECT doc_id,
        |    string_agg(substring('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY ni) AS dhash
        |  FROM nib GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, b AS band_idx, substring(dhash, CAST(b*4 + 1 AS INT), 4) AS band
        |  FROM hex, range(4) r(b)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
        |), ham AS (
        |  SELECT c.doc_a, c.doc_b,
        |    sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hamming
        |  FROM cand c
        |  JOIN bits ba ON ba.doc_id = c.doc_a
        |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.bi = ba.bi
        |  GROUP BY c.doc_a, c.doc_b
        |)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM ham
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "m_image_dedup_delta" ->
      // the delta pair set == the one-shot set here (md5 grays: only
      // cross pairs survive), so the m_image_dedup oracle applies
      // verbatim
      """WITH ids AS (
        |  SELECT doc_id, 0 AS pert FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, 1 FROM documents
        |), px AS (
        |  SELECT i.doc_id, y, x,
        |    (CAST(('0x' || substring(md5(CAST(i.doc_id - 10000*pert AS VARCHAR) || ':' || CAST(y*9 + x AS VARCHAR)), 1, 2)) AS INT) +
        |     CASE WHEN pert = 1 AND y = 0 AND x = 4 THEN 101 ELSE 0 END) % 256 AS g
        |  FROM ids i, range(8) t(y), range(9) u(x)
        |), bits AS (
        |  SELECT a.doc_id, a.y*8 + a.x AS bi,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |), nib AS (
        |  SELECT doc_id, bi // 4 AS ni,
        |    sum(bit * CASE bi % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END) AS v
        |  FROM bits GROUP BY doc_id, bi // 4
        |), hex AS (
        |  SELECT doc_id,
        |    string_agg(substring('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY ni) AS dhash
        |  FROM nib GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, b AS band_idx, substring(dhash, CAST(b*4 + 1 AS INT), 4) AS band
        |  FROM hex, range(4) r(b)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
        |), ham AS (
        |  SELECT c.doc_a, c.doc_b,
        |    sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hamming
        |  FROM cand c
        |  JOIN bits ba ON ba.doc_id = c.doc_a
        |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.bi = ba.bi
        |  GROUP BY c.doc_a, c.doc_b
        |)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM ham
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "m_audio_dedup" -> audioDedupOracle,
    "m_audio_dedup_delta" ->
      // the delta pair set == the one-shot set here (md5 samples:
      // only cross pairs survive), so the m_audio_dedup oracle
      // applies verbatim
      audioDedupOracle,
    "m_video_dedup" ->
      // frame sets are md5-pseudorandom except the two planted
      // shared frames per (doc, copy) pair: shared 2, union 6 —
      // the whole decoded/hashed/bucketed/verified output collapses
      // to planted-structure arithmetic
      """SELECT doc_id AS doc_a, doc_id + 10000 AS doc_b,
        |  CAST(2 AS BIGINT) AS n_shared,
        |  round(2.0 / 6, 6) AS jaccard
        |FROM documents ORDER BY doc_a""".stripMargin,
    "m_audio_energy" ->
      // the stub decode surfaces payload bytes as the text's code
      // points; the frame RMS math (exact long sum of squares, IEEE
      // sqrt, 6dp round) mirrors bit-for-bit
      // the octet_length guard mirrors audioFrameEnergy's explicit
      // zero-byte-payload filter: an empty payload yields ZERO frame
      // rows on both sides (without it the engines' split('','')
      // semantics diverge: Spark [""] vs DuckDB [])
      """WITH audio AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE CAST(doc_id % 3 AS INT) = 1 AND octet_length(CAST(text AS BLOB)) > 0),
        |codes AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), c -> ascii(c)) AS cs
        |  FROM audio),
        |frames AS (
        |  SELECT doc_id, CAST(g - 1 AS BIGINT) AS frame_id,
        |    cs[(g - 1) * 64 + 1 : g * 64] AS f
        |  FROM codes, UNNEST(range(1, CAST(ceil(len(cs) / 64.0) AS BIGINT) + 1)) t(g))
        |SELECT doc_id, frame_id, CAST(len(f) AS BIGINT) AS n_samples,
        |  round(sqrt(CAST(list_sum(list_transform(f, x -> CAST(x AS BIGINT) * x)) AS DOUBLE)
        |    / len(f)), 6) AS rms
        |FROM frames ORDER BY doc_id, frame_id""".stripMargin,
  )
}
