package graft.cache

import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-result cache: storage providers + the manager that keys data
  * and metadata by (table, cache_key).
  *
  * Reference: src/oracle_duckdb_sync/application/cache_provider.py
  * (`CacheProvider` get/set/has/delete/clear) and
  * application/query_cache_manager.py:51-373 (`QueryCacheManager`,
  * `CachedQueryMetadata`, `invalidate_if_stale`).
  *
  * Spark shape: a cached "value" is a DataFrame, so a provider stores
  * RESULT SETS, not pickled objects —
  *  - [[ParquetCacheProvider]]: one parquet dataset per key on any
  *    Hadoop filesystem. Durable, shared across sessions/executors,
  *    sized for 100 TB results (a cache hit is a parquet scan that
  *    prunes/pushes down like any other table).
  *  - [[MemoryCacheProvider]]: `persist()`-backed DataFrames for
  *    single-application dashboard latency; metadata in-process.
  * Metadata rides next to the data as a small JSON document (same
  * atomic temp-file + rename pattern as graft.sync.StateStore).
  */
trait CacheProvider {
  def putData(key: String, df: DataFrame): Unit
  def getData(key: String): Option[DataFrame]
  def hasData(key: String): Boolean
  def putMeta(key: String, json: String): Unit
  def getMeta(key: String): Option[String]
  def hasMeta(key: String): Boolean
  def delete(key: String): Unit
  def clear(): Unit
}

/** Durable provider: `dir/<key>` parquet datasets + `dir/<key>.meta.json`. */
class ParquetCacheProvider(spark: SparkSession, dir: String) extends CacheProvider {

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dataPath(key: String) = new Path(dir, key)
  private def metaPath(key: String) = new Path(dir, s"$key.meta.json")

  /** Write-to-temp + swap: an incremental refresh WRITES a plan that
    * READS the current cached dataset (cached ∪ fresh) — a direct
    * overwrite would delete its own input mid-job. The temp dataset is
    * fully materialized before the old one is dropped.
    */
  override def putData(key: String, df: DataFrame): Unit = {
    val tmp = new Path(dir, s".$key.tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val p = dataPath(key)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(tmp, p)
  }

  override def getData(key: String): Option[DataFrame] =
    if (hasData(key)) Some(spark.read.parquet(dataPath(key).toString)) else None

  override def hasData(key: String): Boolean = fs.exists(dataPath(key))

  override def putMeta(key: String, json: String): Unit = {
    val p = metaPath(key)
    val tmp = new Path(dir, s".$key.meta.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  override def getMeta(key: String): Option[String] =
    if (!fs.exists(metaPath(key))) None
    else {
      val p = metaPath(key)
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }

  override def hasMeta(key: String): Boolean = fs.exists(metaPath(key))

  override def delete(key: String): Unit = {
    if (fs.exists(dataPath(key))) fs.delete(dataPath(key), true)
    if (fs.exists(metaPath(key))) fs.delete(metaPath(key), false)
  }

  override def clear(): Unit = {
    val d = new Path(dir)
    if (fs.exists(d)) fs.listStatus(d).foreach(s => fs.delete(s.getPath, true))
  }
}

/** In-process provider: `persist()`ed plans keyed in a concurrent map. */
class MemoryCacheProvider extends CacheProvider {
  private val data = TrieMap.empty[String, DataFrame]
  private val meta = TrieMap.empty[String, String]

  override def putData(key: String, df: DataFrame): Unit = {
    val cached = df.persist()
    cached.count() // materialize: a cache hit must not re-run the source plan
    // only then drop the previous entry — the new plan may READ it
    data.put(key, cached).foreach(_.unpersist())
  }
  override def getData(key: String): Option[DataFrame] = data.get(key)
  override def hasData(key: String): Boolean = data.contains(key)
  override def putMeta(key: String, json: String): Unit = meta.put(key, json)
  override def getMeta(key: String): Option[String] = meta.get(key)
  override def hasMeta(key: String): Boolean = meta.contains(key)
  override def delete(key: String): Unit = {
    data.remove(key).foreach(_.unpersist())
    meta.remove(key)
  }
  override def clear(): Unit = {
    data.values.foreach(_.unpersist())
    data.clear()
    meta.clear()
  }
}

/** Metadata for a cached query result — what incremental refresh and
  * staleness invalidation need (query_cache_manager.py:22-49).
  */
case class CachedQueryMetadata(
    lastTimestamp: Option[String],
    rowCount: Long,
    cachedAtMillis: Long,
    selectedConversions: Map[String, String] = Map.empty)

object CachedQueryMetadata {
  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")

  def toJson(m: CachedQueryMetadata): String = {
    val ts = m.lastTimestamp.map(v => s""""${esc(v)}"""").getOrElse("null")
    val conv = m.selectedConversions.toSeq.sorted
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    s"""{"last_timestamp": $ts, "row_count": ${m.rowCount}, """ +
      s""""cached_at": ${m.cachedAtMillis}, "selected_conversions": $conv}"""
  }

  def fromJson(json: String): Option[CachedQueryMetadata] = {
    val tsRe = """"last_timestamp":\s*(?:null|"((?:[^"\\]|\\.)*)")""".r
    val rcRe = """"row_count":\s*(-?\d+)""".r
    val caRe = """"cached_at":\s*(-?\d+)""".r
    val convBlockRe = """"selected_conversions":\s*\{([^}]*)\}""".r
    val pairRe = """"((?:[^"\\]|\\.)*)":\s*"((?:[^"\\]|\\.)*)"""".r
    for {
      rc <- rcRe.findFirstMatchIn(json).map(_.group(1).toLong)
      ca <- caRe.findFirstMatchIn(json).map(_.group(1).toLong)
    } yield CachedQueryMetadata(
      lastTimestamp = tsRe.findFirstMatchIn(json)
        .flatMap(m => Option(m.group(1))).map(unesc),
      rowCount = rc,
      cachedAtMillis = ca,
      selectedConversions = convBlockRe.findFirstMatchIn(json)
        .map(m => pairRe.findAllMatchIn(m.group(1))
          .map(p => unesc(p.group(1)) -> unesc(p.group(2))).toMap)
        .getOrElse(Map.empty))
  }
}

/** Cache manager: (table, optional cache_key) → data + metadata, with
  * hit/miss statistics and age-based invalidation. `nowMillis` is
  * injectable so staleness is deterministic under test.
  */
class QueryCacheManager(provider: CacheProvider,
                        nowMillis: () => Long = () => System.currentTimeMillis()) {

  private val DataPrefix = "query_data"
  private val MetaPrefix = "query_metadata"
  private var hits = 0L
  private var misses = 0L

  private def dataKey(table: String, custom: Option[String]) =
    custom.fold(s"${DataPrefix}_$table")(k => s"${DataPrefix}_${table}_$k")
  private def metaKey(table: String, custom: Option[String]) =
    custom.fold(s"${MetaPrefix}_$table")(k => s"${MetaPrefix}_${table}_$k")

  def getCachedData(table: String, cacheKey: Option[String] = None): Option[DataFrame] = {
    val r = provider.getData(dataKey(table, cacheKey))
    if (r.isDefined) hits += 1 else misses += 1
    r
  }

  def setCachedData(table: String, df: DataFrame, meta: CachedQueryMetadata,
                    cacheKey: Option[String] = None): Unit = {
    provider.putData(dataKey(table, cacheKey), df)
    provider.putMeta(metaKey(table, cacheKey), CachedQueryMetadata.toJson(meta))
  }

  def getMetadata(table: String, cacheKey: Option[String] = None): Option[CachedQueryMetadata] =
    provider.getMeta(metaKey(table, cacheKey)).flatMap(CachedQueryMetadata.fromJson)

  /** True iff BOTH data and metadata are present (reference has_cache). */
  def hasCache(table: String, cacheKey: Option[String] = None): Boolean =
    provider.hasData(dataKey(table, cacheKey)) &&
      provider.hasMeta(metaKey(table, cacheKey))

  /** Clear one (table, key) entry, or everything when `table` is None.
    * Statistics reset either way (reference clear_cache).
    */
  def clearCache(table: Option[String] = None, cacheKey: Option[String] = None): Unit = {
    table match {
      case Some(t) =>
        provider.delete(dataKey(t, cacheKey))
        provider.delete(metaKey(t, cacheKey))
      case None => provider.clear()
    }
    hits = 0L
    misses = 0L
  }

  /** Merge metadata field updates without replacing the whole record. */
  def updateMetadata(table: String, update: CachedQueryMetadata => CachedQueryMetadata,
                     cacheKey: Option[String] = None): Unit =
    getMetadata(table, cacheKey).foreach { m =>
      provider.putMeta(metaKey(table, cacheKey), CachedQueryMetadata.toJson(update(m)))
    }

  /** Drop the entry if it is older than `maxAgeSeconds`; returns true
    * iff invalidated (reference invalidate_if_stale).
    */
  def invalidateIfStale(table: String, maxAgeSeconds: Long,
                        cacheKey: Option[String] = None): Boolean =
    getMetadata(table, cacheKey) match {
      case Some(m) if (nowMillis() - m.cachedAtMillis) / 1000.0 > maxAgeSeconds =>
        clearCache(Some(table), cacheKey)
        true
      case _ => false
    }

  /** (hits, misses, hitRate) since construction or the last clear. */
  def statistics: (Long, Long, Double) = {
    val total = hits + misses
    (hits, misses, if (total == 0) 0.0 else hits.toDouble / total)
  }
}
