package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table statistics — the agent's GetTableStats tool and the stats
  * panel, as single-pass aggregations.
  *
  * Reference: src/oracle_duckdb_sync/agent/tools/query_tools.py:43
  * (GetTableStatsTool), src/oracle_duckdb_sync/application/
  * query_service.py:280-310 (MIN/MAX/AVG per numeric column, with
  * TRY_CAST for varchar-typed numerics), src/oracle_duckdb_sync/
  * data/query_core.py:63 (row count).
  *
  * One job, one partial-agg shuffle of a single row of state per
  * column — O(columns), not O(rows), over the wire at any scale.
  */
object TableStats {

  /** count + min/max/avg(rounded) for each numeric column, one row. */
  def numericStats(table: DataFrame, numericCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("row_count") +:
      numericCols.flatMap { c =>
        // avg via associative decimal sum: deterministic across any
        // partitioning (see TimeBucketAgg scaladoc)
        Seq(min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"),
            (sum(col(c).cast("decimal(30,12)")).cast("double") /
              count(col(c))).as(s"${c}_avg"))
      }
    table.agg(aggs.head, aggs.tail: _*)
  }

  /** Stats over VARCHAR columns holding numerics — the reference's
    * TRY_CAST stats path (query_service.py:280-310): cast failures
    * count as NULL, min/max/avg over the parseable values.
    */
  def varcharNumericStats(table: DataFrame, varcharCols: Seq[String]): DataFrame = {
    val casted = varcharCols.foldLeft(table) { (t, c) =>
      t.withColumn(s"__$c", expr(s"try_cast(`$c` AS DOUBLE)"))
    }
    val aggs: Seq[Column] =
      count(lit(1)).as("row_count") +:
      varcharCols.flatMap { c =>
        Seq(count(col(s"__$c")).as(s"${c}_parsed"),
            min(col(s"__$c")).as(s"${c}_min"),
            max(col(s"__$c")).as(s"${c}_max"),
            round(avg(col(s"__$c")), 6).as(s"${c}_avg"))
      }
    casted.agg(aggs.head, aggs.tail: _*)
  }

  /** Numeric / datetime column detection from the schema — the
    * reference's visualization column picker (ui/visualization.py
    * numeric_columns / datetime_columns).
    */
  def numericColumns(table: DataFrame): Seq[String] =
    table.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq

  def datetimeColumns(table: DataFrame): Seq[String] =
    table.schema.fields.collect {
      case f if f.dataType.typeName.startsWith("timestamp") ||
                f.dataType.typeName == "date" => f.name
    }.toSeq

  /** Equal-width histogram of a numeric column: one min/max pass (tiny
    * driver round-trip), then one groupBy over computed bin ids — the
    * distribution view behind the stats panel. The top edge folds into
    * the last bin (`least`), matching the usual closed-right-edge rule.
    */
  def histogram(table: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val r = table.agg(min(col(c).cast("double")).as("lo"),
      max(col(c).cast("double")).as("hi")).head()
    if (r.isNullAt(0))
      return table.sparkSession.emptyDataFrame
        .select(lit(0).as("bin"), lit(0L).as("n"))
        .limit(0)
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    if (hi == lo)
      return table.filter(col(c).isNotNull)
        .agg(count(lit(1)).as("n")).select(lit(0).as("bin"), col("n"))
    val width = (hi - lo) / bins
    table.filter(col(c).isNotNull)
      .select(least(floor((col(c).cast("double") - lo) / width).cast("int"),
        lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** COUNT(*) per table of a catalog — list_tables + row counts.
    *
    * Counts come from parquet FOOTER metadata (exact by the format's
    * contract — the same numbers ANALYZE/metastore stats record), so
    * no table is scanned at all: a catalog-wide count over 100 TB is
    * a few footer reads per table instead of a full-corpus pass.
    * Driver-side footer reads are bounded by file count; a table with
    * more files than `maxDriverFiles` falls back to the distributed
    * count plan (vectorized, still scan-light), so a million-file
    * table cannot serialize the driver.
    */
  def rowCounts(spark: SparkSession, dir: String,
                names: Seq[String], maxDriverFiles: Int = 1024): DataFrame = {
    import graft.core.Tables
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    def footerCount(table: String): Option[Long] = try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isFile) Seq(p)
        else fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      if (files.isEmpty || files.length > maxDriverFiles) None
      else Some(files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum)
    } catch { case _: Exception => None }
    val (meta, scanned) = names.map(n => n -> footerCount(n))
      .partition(_._2.isDefined)
    val metaDf =
      if (meta.isEmpty) None
      else Some(meta.map { case (n, c) => (n, c.get) }.toDF("table_name", "n_rows"))
    val scanDf =
      if (scanned.isEmpty) None
      else Some(scanned.map { case (n, _) =>
        Tables.load(spark, dir, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows"))
      }.reduce(_ unionByName _))
    (metaDf ++ scanDf).reduce(_ unionByName _).orderBy("table_name")
  }
}
