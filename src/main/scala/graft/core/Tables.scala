package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named loaders for the engine's table universe.
  *
  * Mirrors the reference's notion of a synced table catalog
  * (reference: src/oracle_duckdb_sync/data/query_core.py:20
  * `get_available_tables`) — here the catalog is a directory of
  * parquet tables. At 100 TB each "table" is a partitioned parquet
  * dataset; `spark.read.parquet` handles both the single-file test
  * layout and a partitioned directory identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Catalog-aware loader: applies per-table normalization (the
    * events nanos→micros conversion) so callers can address any table
    * uniformly by name.
    */
  def loadNormalized(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else load(spark, dir, name)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as raw INT64 (legacy conf)
    * and convert with integer division — `ts div 1000` keeps exact µs
    * (a double division would lose precision above 2^53 ns).
    *
    * The nanosAsLong conf is session-scoped, so set it at session
    * build (`.config("spark.sql.legacy.parquet.nanosAsLong", "true")`)
    * as Bench/Verify do; the guarded set below only covers sessions
    * built elsewhere, and never rewrites an already-correct conf (no
    * per-read global side effect).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
