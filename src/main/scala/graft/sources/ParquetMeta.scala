package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet METADATA reads — answers that a footer already
  * holds and that therefore must not cost a Spark job. The first use
  * is corpus sizing for self-tuning operators ([[graft.sim.SemDedup]]
  * auto-nlist): a `df.count()` over anything but a bare scan is a full
  * pass, while the footers of the source files answer it in
  * O(files) driver work — the same listing + footer I/O the scan's
  * planning phase performs anyway.
  *
  * 100 TB note: O(files) driver listings are exactly how Spark plans a
  * scan of the same directory, so this is never the bottleneck — but
  * it IS driver-side; for tables with 10⁵⁺ files prefer a catalog
  * (table-format) row count when one exists.
  */
object ParquetMeta {

  private def dataFiles(spark: SparkSession, dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no parquet data at $dir")
    def walk(s: FileStatus): Seq[FileStatus] =
      if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
      else if (s.getPath.getName.endsWith(".parquet")) Seq(s)
      else Nil
    walk(fs.getFileStatus(p))
  }

  /** Exact row count of a parquet file/directory from footer metadata
    * only — zero Spark jobs, zero data pages read.
    */
  def rowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    dataFiles(spark, dir).map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
