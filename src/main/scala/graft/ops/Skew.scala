package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins and aggregations whose key
  * distribution is pathological (a handful of hot keys holding a large
  * share of the rows — common in event/user data at 100 TB).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting is the deterministic fallback when a single key exceeds
  * what partition-splitting can balance (e.g. one key = 30% of the
  * table) or when AQE is unavailable (streaming).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `keys`, with the large side spread
    * across `salt` sub-partitions per key and the small side
    * replicated `salt`× — result set identical to the plain join, but
    * a hot key's rows land in `salt` reducer partitions instead of 1.
    *
    * The salt is a deterministic hash of `saltCol` (any column that
    * varies within a key, e.g. the fact table's own id) — no RNG, so
    * retried tasks produce identical output.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltCol: String, salt: Int): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(xxhash64(col(saltCol)), lit(salt.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (keys, salt) first, then combine partials per key. Correct for
    * decomposable aggregates (sum/count here); a hot key's first-phase
    * work spreads over `salt` partitions.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltCol: String, salt: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(saltCol)), lit(salt.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"${valueCol}_sum"), sum(col("__n")).as("n_rows"))

  /** Top-N heaviest keys with their row share — the diagnostic that
    * decides whether salting is needed at all.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share", round(col("n_rows") / lit(total.toDouble), 6))
      .orderBy(col("n_rows").desc, concat_ws("|", keys.map(col): _*))
      .limit(topN)
  }
}
