package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.cache._

/** Cache layer specs — mirrors the reference's
  * test/application/test_cache_provider.py surfaces: hit/miss +
  * statistics, staleness invalidation, and incremental refresh
  * equaling a full recompute.
  */
class CacheSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(n: Int) = (1 to n).map(i =>
    (i.toLong, Timestamp.valueOf(f"2024-01-01 00:00:$i%02d"), s"v$i", i.toString))
    .toDF("id", "ts", "name", "v_str")

  test("metadata JSON round-trips, including null watermark and conversions") {
    val full = CachedQueryMetadata(Some("2024-01-01 00:00:10"), 42L, 1700000000000L,
      Map("v_str" -> "numeric", "d\"quoted" -> "datetime"))
    assert(CachedQueryMetadata.fromJson(CachedQueryMetadata.toJson(full)).contains(full))
    val bare = CachedQueryMetadata(None, 0L, 5L)
    assert(CachedQueryMetadata.fromJson(CachedQueryMetadata.toJson(bare)).contains(bare))
  }

  test("memory provider: hit/miss statistics, hasCache needs data AND metadata") {
    val mgr = new QueryCacheManager(new MemoryCacheProvider)
    assert(mgr.getCachedData("t").isEmpty)            // miss
    assert(!mgr.hasCache("t"))
    mgr.setCachedData("t", eventsDf(3), CachedQueryMetadata(None, 3L, 0L))
    assert(mgr.hasCache("t"))
    assert(mgr.getCachedData("t").exists(_.count() == 3)) // hit
    val (hits, misses, rate) = mgr.statistics
    assert(hits == 1 && misses == 1 && rate == 0.5)
    mgr.clearCache(Some("t"))
    assert(!mgr.hasCache("t"))
    assert(mgr.statistics == ((0L, 0L, 0.0)))          // stats reset on clear
  }

  test("cache keys separate tables and custom cache keys") {
    val mgr = new QueryCacheManager(new MemoryCacheProvider)
    mgr.setCachedData("t", eventsDf(1), CachedQueryMetadata(None, 1L, 0L))
    mgr.setCachedData("t", eventsDf(2), CachedQueryMetadata(None, 2L, 0L), Some("k2"))
    assert(mgr.getCachedData("t").exists(_.count() == 1))
    assert(mgr.getCachedData("t", Some("k2")).exists(_.count() == 2))
    mgr.clearCache(Some("t"))                          // default key only
    assert(!mgr.hasCache("t") && mgr.hasCache("t", Some("k2")))
  }

  test("invalidateIfStale drops only entries past max age (injected clock)") {
    var now = 1000L * 1000
    val mgr = new QueryCacheManager(new MemoryCacheProvider, () => now)
    mgr.setCachedData("t", eventsDf(2), CachedQueryMetadata(None, 2L, now))
    assert(!mgr.invalidateIfStale("t", maxAgeSeconds = 300))
    assert(mgr.hasCache("t"))
    now += 301 * 1000                                  // advance past the TTL
    assert(mgr.invalidateIfStale("t", maxAgeSeconds = 300))
    assert(!mgr.hasCache("t"))
    assert(!mgr.invalidateIfStale("t", maxAgeSeconds = 300)) // nothing left
  }

  test("updateMetadata merges fields without replacing the record") {
    val mgr = new QueryCacheManager(new MemoryCacheProvider)
    mgr.setCachedData("t", eventsDf(2),
      CachedQueryMetadata(Some("a"), 2L, 7L, Map("x" -> "numeric")))
    mgr.updateMetadata("t", _.copy(rowCount = 99L))
    val m = mgr.getMetadata("t").get
    assert(m.rowCount == 99L && m.lastTimestamp.contains("a")
      && m.selectedConversions == Map("x" -> "numeric"))
  }

  test("composed keys are unambiguous: (a, b) never collides with (a_b, none)") {
    val mgr = new QueryCacheManager(new MemoryCacheProvider)
    mgr.setCachedData("a", eventsDf(1), CachedQueryMetadata(None, 1L, 0L), Some("b"))
    mgr.setCachedData("a_b", eventsDf(2), CachedQueryMetadata(None, 2L, 0L))
    assert(mgr.getCachedData("a", Some("b")).exists(_.count() == 1))
    assert(mgr.getCachedData("a_b").exists(_.count() == 2))
    mgr.clearCache(Some("a_b"))
    assert(mgr.hasCache("a", Some("b")) && !mgr.hasCache("a_b")) // no cross-invalidation
  }

  test("parquet provider: data+meta commit atomically and survive pointer loss") {
    val cacheDir = tempDir("graft-cache-atomic")
    val prov = new ParquetCacheProvider(spark, cacheDir)
    val mgr = new QueryCacheManager(prov)
    mgr.setCachedData("t", eventsDf(5), CachedQueryMetadata(Some("wm1"), 5L, 0L))
    // refresh: the new plan READS the current entry (cached ∪ fresh)
    val merged = mgr.getCachedData("t").get.unionByName(eventsDf(7).filter(col("id") > 5))
    mgr.setCachedData("t", merged, CachedQueryMetadata(Some("wm2"), 7L, 1L))
    assert(mgr.getCachedData("t").exists(_.count() == 7))
    assert(mgr.getMetadata("t").flatMap(_.lastTimestamp).contains("wm2"))
    // crash recovery: lose the CURRENT pointer mid-swap — the complete
    // version still resolves, with data and ITS metadata paired
    val keyDir = new java.io.File(cacheDir).listFiles().filter(_.isDirectory).head
    assert(new java.io.File(keyDir, "CURRENT").delete())
    assert(mgr.hasCache("t"))
    assert(mgr.getCachedData("t").exists(_.count() == 7))
    assert(mgr.getMetadata("t").flatMap(_.lastTimestamp).contains("wm2"))
    // old versions were garbage-collected after the swap
    assert(keyDir.listFiles().count(_.getName.startsWith("v-")) == 1)
  }

  test("parquet provider: appendEntry writes only the tail slice; putEntry compacts") {
    val cacheDir = tempDir("graft-cache-append")
    val prov = new ParquetCacheProvider(spark, cacheDir)
    prov.putEntry("t", eventsDf(10), """{"m":1}""")
    val keyDir = new java.io.File(cacheDir).listFiles().filter(_.isDirectory).head
    def slices = keyDir.listFiles().filter(_.getName.startsWith("slice-")).sortBy(_.getName)
    assert(slices.length == 1)
    val initialFiles = slices.head.listFiles().map(f => f.getName -> f.lastModified()).toMap

    prov.appendEntry("t", eventsDf(15).filter(col("id") > 10), """{"m":2}""")
    // the tail landed as a SECOND slice; the initial slice's parquet
    // files were not rewritten — the O(tail) contract
    assert(slices.length == 2)
    assert(slices.head.listFiles().map(f => f.getName -> f.lastModified()).toMap
      == initialFiles)
    assert(spark.read.parquet(slices.last.getPath).count() == 5) // tail only
    assert(prov.getData("t").exists(_.count() == 15)) // union reads all slices
    assert(prov.getMeta("t").contains("""{"m":2}"""))
    // appended entry survives pointer loss like any committed version
    assert(new java.io.File(keyDir, "CURRENT").delete())
    assert(prov.getData("t").exists(_.count() == 15))

    // a full rewrite is the compactor: back to one slice
    prov.putEntry("t", prov.getData("t").get.filter(col("id") <= 12), """{"m":3}""")
    assert(slices.length == 1)
    assert(prov.getData("t").exists(_.count() == 12))
  }

  test("memory provider: append compaction bounds the union-plan depth") {
    val prov = new MemoryCacheProvider(compactThreshold = 2)
    prov.putEntry("t", eventsDf(2), "{}")
    (1 to 5).foreach(i =>
      prov.appendEntry("t", eventsDf(2 + i).filter(col("id") > 1 + i), s"""{"i":$i}"""))
    assert(prov.getData("t").exists(_.count() == 7))
    assert(prov.getMeta("t").contains("""{"i":5}"""))
    // localCheckpoint every 2 appends cuts the union chain — the plan
    // never accumulates one Union per refresh
    val unions = prov.getData("t").get.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions <= 2)
  }

  test("parquet provider: appendEntry self-compacts at the slice threshold") {
    val cacheDir = tempDir("graft-cache-compact")
    val prov = new ParquetCacheProvider(spark, cacheDir, compactThreshold = 3)
    prov.putEntry("t", eventsDf(2), """{"m":1}""")
    prov.appendEntry("t", eventsDf(4).filter(col("id") > 2), """{"m":2}""")
    prov.appendEntry("t", eventsDf(6).filter(col("id") > 4), """{"m":3}""")
    val keyDir = new java.io.File(cacheDir).listFiles().filter(_.isDirectory).head
    def nSlices = keyDir.listFiles().count(_.getName.startsWith("slice-"))
    assert(nSlices == 3)
    // a 4th slice would exceed the threshold → this append compacts
    prov.appendEntry("t", eventsDf(8).filter(col("id") > 6), """{"m":4}""")
    assert(nSlices == 1)
    assert(prov.getData("t").exists(_.count() == 8))
    assert(prov.getMeta("t").contains("""{"m":4}"""))
  }

  test("parquet provider: vacuum removes a stranded append slice, keeps referenced ones") {
    val cacheDir = tempDir("graft-cache-strand")
    val prov = new ParquetCacheProvider(spark, cacheDir)
    prov.putEntry("t", eventsDf(3), """{"m":1}""")
    prov.appendEntry("t", eventsDf(5).filter(col("id") > 3), """{"m":2}""")
    // an appendEntry interrupted after its tail write strands a slice
    // no manifest references
    eventsDf(1).write.parquet(s"$cacheDir/t/slice-${"%010d".format(9)}")
    assert(prov.vacuum(graceMillis = 0) == 1)
    assert(prov.getData("t").exists(_.count() == 5)) // both committed slices intact
    assert(prov.vacuum(graceMillis = 0) == 0)
  }

  test("parquet-backed queryWithCaching: initial, incremental, no-new-data") {
    val srcDir = tempDir("graft-cache-src")
    val cacheDir = tempDir("graft-cache-store")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedQueryService(spark, srcDir, mgr)

    // initial: 10 source rows
    eventsDf(10).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.queryWithCaching("t", limit = 1000, timeCol = Some("ts"),
      selectedConversions = Some(Map.empty))
    assert(!r1.isIncremental && r1.rowCount == 10 && r1.newRows == 10)
    assert(mgr.getMetadata("t").flatMap(_.lastTimestamp)
      .exists(_.startsWith("2024-01-01 00:00:10")))

    // the source grows to 15 rows → only the 5-row tail is new
    eventsDf(15).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = svc.queryWithCaching("t", timeCol = Some("ts"))
    assert(r2.isIncremental && r2.rowCount == 15 && r2.newRows == 5)
    // incremental refresh equals a full recompute
    val got = r2.df.select("id", "name").as[(Long, String)].collect().toSeq
    val want = eventsDf(15).select("id", "name").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(got.sortBy(_._1) == want)
    // the refresh APPENDED a tail slice instead of rewriting the cache
    assert(new java.io.File(cacheDir).listFiles().filter(_.isDirectory).head
      .listFiles().count(_.getName.startsWith("slice-")) == 2)

    // third call: nothing past the watermark → cached result, 0 new
    val r3 = svc.queryWithCaching("t", timeCol = Some("ts"))
    assert(r3.isIncremental && r3.rowCount == 15 && r3.newRows == 0)
  }

  test("selected conversions persist in metadata and reapply on refresh") {
    val srcDir = tempDir("graft-cache-src2")
    val cacheDir = tempDir("graft-cache-store2")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedQueryService(spark, srcDir, mgr)

    eventsDf(8).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.queryWithCaching("t", timeCol = Some("ts"),
      selectedConversions = Some(Map("v_str" -> "numeric")))
    assert(r1.df.schema("v_str").dataType.typeName == "double")
    assert(r1.df.schema("name").dataType.typeName == "string") // unselected survives

    // refresh without restating the conversions — metadata carries them,
    // so the fresh slice converts identically and the union lines up
    eventsDf(12).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = svc.queryWithCaching("t", timeCol = Some("ts"))
    assert(r2.newRows == 4)
    assert(r2.df.schema("v_str").dataType.typeName == "double")
    assert(r2.df.select(sum("v_str")).head().getDouble(0) == (1 to 12).sum.toDouble)
  }

  test("cached aggregate refresh is bit-identical to a full recompute") {
    val srcDir = tempDir("graft-cache-agg")
    val cacheDir = tempDir("graft-cache-aggstore")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedAggService(spark, srcDir, mgr)
    // ts monotone in id so appended rows are past the watermark
    def rows(n: Int) = (1 to n).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        i * 1.7 - 3))
      .toDF("id", "ts", "v")

    rows(200).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.aggregateWithCaching("t", "ts", "1 hour", "v")
    assert(!r1.isIncremental && r1.rowCount == 200)

    // source grows; refresh aggregates only the tail and merges state
    rows(300).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = svc.aggregateWithCaching("t", "ts", "1 hour", "v")
    assert(r2.isIncremental && r2.rowCount == 300 && r2.newRows == 100)

    // bit-identical to aggregating the full table from scratch
    val full = graft.ops.IncrementalAgg.readState(
      graft.ops.IncrementalAgg.bucketState(
        spark.read.parquet(s"$srcDir/t.parquet"), "ts", "1 hour", "v"))
    val got = r2.df.collect().map(_.toSeq).toSeq
    val want = full.collect().map(_.toSeq).toSeq
    assert(got == want)

    // no new data: cached state returns untouched
    val r3 = svc.aggregateWithCaching("t", "ts", "1 hour", "v")
    assert(r3.isIncremental && r3.newRows == 0)
    assert(r3.df.collect().map(_.toSeq).toSeq == want)
  }

  test("cached histogram-quantile refresh is bit-identical to a full recompute") {
    val srcDir = tempDir("graft-cache-hist")
    val cacheDir = tempDir("graft-cache-histstore")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedAggService(spark, srcDir, mgr)
    def rows(n: Int) = (1 to n).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        i * 1.7 - 3))
      .toDF("id", "ts", "v")

    rows(200).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.quantilesWithCaching("t", "ts", "1 hour", "v",
      0.0, 600.0, 60, Seq(0.5, 0.9))
    assert(!r1.isIncremental && r1.rowCount == 200)

    rows(300).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = svc.quantilesWithCaching("t", "ts", "1 hour", "v",
      0.0, 600.0, 60, Seq(0.5, 0.9))
    assert(r2.isIncremental && r2.rowCount == 300 && r2.newRows == 100)

    val full = graft.ops.IncrementalAgg.quantilesFromState(
      graft.ops.IncrementalAgg.histState(
        spark.read.parquet(s"$srcDir/t.parquet"), "ts", "1 hour", "v",
        0.0, 600.0, 60),
      0.0, 600.0, Seq(0.5, 0.9))
    assert(r2.df.collect().map(_.toSeq).toSeq ==
      full.collect().map(_.toSeq).toSeq)

    // no new data: state untouched
    val r3 = svc.quantilesWithCaching("t", "ts", "1 hour", "v",
      0.0, 600.0, 60, Seq(0.5, 0.9))
    assert(r3.isIncremental && r3.newRows == 0)
  }

  test("automatic inference resolves once and is recorded for refreshes") {
    val srcDir = tempDir("graft-cache-auto")
    val cacheDir = tempDir("graft-cache-autostore")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedQueryService(spark, srcDir, mgr)

    eventsDf(8).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.queryWithCaching("t", timeCol = Some("ts")) // sel = None
    assert(r1.df.schema("v_str").dataType.typeName == "double") // inferred
    // the inferred decision is persisted as a concrete map
    assert(mgr.getMetadata("t").exists(_.selectedConversions == Map("v_str" -> "numeric")))

    // the fresh tail alone would NOT infer v_str numeric (values are
    // non-numeric) — the recorded map must still apply so the union
    // keeps the cached schema instead of corrupting it
    val tail = (9 to 12).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:00:$i%02d"), s"v$i", s"x$i"))
      .toDF("id", "ts", "name", "v_str")
    eventsDf(8).unionByName(tail).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = svc.queryWithCaching("t", timeCol = Some("ts"))
    assert(r2.newRows == 4)
    assert(r2.df.schema("v_str").dataType.typeName == "double") // schema stable
    // unparseable tail values become null, cached bulk keeps its values
    assert(r2.df.filter(col("v_str").isNull).count() == 4)
  }

  test("initial-load watermark includes the whole boundary-timestamp tie group") {
    val srcDir = tempDir("graft-cache-tie")
    val cacheDir = tempDir("graft-cache-tiestore")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedQueryService(spark, srcDir, mgr)
    // 6 rows share the boundary timestamp; limit = 4 cuts inside the group
    val ties = (1 to 8).map { i =>
      val ts = if (i <= 6) "2024-01-01 00:00:01" else "2024-01-01 00:00:09"
      (i.toLong, Timestamp.valueOf(ts), s"v$i", i.toString)
    }.toDF("id", "ts", "name", "v_str")
    ties.write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = svc.queryWithCaching("t", limit = 4, timeCol = Some("ts"),
      selectedConversions = Some(Map.empty))
    assert(r1.rowCount == 6) // widened to the full tie group — no silent loss
    val r2 = svc.queryWithCaching("t", timeCol = Some("ts"))
    assert(r2.rowCount == 8 && r2.newRows == 2) // the rest arrives incrementally
  }

  test("queryWithConversionOptions returns suggestions without converting") {
    val srcDir = tempDir("graft-cache-src3")
    val cacheDir = tempDir("graft-cache-store3")
    val mgr = new QueryCacheManager(new ParquetCacheProvider(spark, cacheDir))
    val svc = new CachedQueryService(spark, srcDir, mgr)
    eventsDf(6).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val (r, suggestions) = svc.queryWithConversionOptions("t", timeCol = Some("ts"))
    assert(r.df.schema("v_str").dataType.typeName == "string") // untouched
    assert(suggestions == Map("v_str" -> "numeric"))
  }
}
