package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table source/sink helpers — the co-located-join scale path.
  *
  * Writing the two sides of a recurring fact⋈fact join bucketed (and
  * sorted) by the join key means Catalyst plans the join with NO
  * shuffle Exchange on either side: each task merges bucket i of A
  * with bucket i of B locally. At 100 TB this converts the dominant
  * repeated shuffle of a sync pipeline (e.g. lineitem⋈orders every
  * refresh) into a one-time layout cost paid at write time.
  *
  * The same layout serves the reference's upsert path: a bucketed
  * target + bucketed staging batch merge without re-shuffling the
  * target.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) parquet table in the
    * session catalog. Bucket count is a layout property: pick it for
    * the TARGET scale (e.g. 4096 at 100 TB) — readers never re-shuffle
    * regardless of executor count.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Equi-join two identically-bucketed catalog tables on `keys` —
    * plans with zero shuffle when bucket specs match.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
