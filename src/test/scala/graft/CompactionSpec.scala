package graft

import org.apache.spark.sql.functions._

import graft.sync.{Compaction, PartitionedSync}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def table(n: Int) =
    spark.range(n).select(col("id"),
      (col("id") % 4).cast("string").as("grp"),
      (col("id") * 7 % 1000).as("v"))

  test("census counts files and bytes per partition from the listing") {
    val path = tempDir("graft-compact-census")
    PartitionedSync.writeFull(table(1000), col("grp"), path)
    val c = Compaction.census(spark, path)
    assert(c.map(_.partition) == Seq("0", "1", "2", "3"))
    assert(c.forall(_.files >= 1))
    assert(c.forall(_.bytes > 0))
  }

  test("compact bin-packs fragmented partitions, preserves content, skips healthy ones") {
    val path = tempDir("graft-compact-run")
    PartitionedSync.writeFull(table(1000), col("grp"), path)
    // fragment partitions 0 and 1 with five tiny appends each
    (1 to 5).foreach { i =>
      table(40).filter(col("grp").isin("0", "1"))
        .withColumn("id", col("id") + lit(10000L * i))
        .withColumn(PartitionedSync.PartCol, col("grp"))
        .write.mode("append").partitionBy(PartitionedSync.PartCol).parquet(path)
    }
    val before = Compaction.census(spark, path)
    val fragmented = before.filter(s => Set("0", "1")(s.partition))
    assert(fragmented.forall(_.files >= 6))
    val healthyFiles = before.filter(s => Set("2", "3")(s.partition))
      .map(s => s.partition -> s.files).toMap

    val want = PartitionedSync.read(spark, path)
      .orderBy("id", "grp").collect().toSeq

    // huge target → ideal is 1 file per partition
    val stats = Compaction.compact(spark, path, targetBytes = 1L << 30)
    assert(stats.compacted.sorted == Seq("0", "1"))
    assert(stats.filesAfter < stats.filesBefore)

    val after = Compaction.census(spark, path)
    assert(after.filter(s => Set("0", "1")(s.partition)).forall(_.files == 1))
    // untouched partitions keep their file layout
    assert(after.filter(s => Set("2", "3")(s.partition))
      .map(s => s.partition -> s.files).toMap == healthyFiles)
    // content is bit-identical
    val got = PartitionedSync.read(spark, path)
      .orderBy("id", "grp").collect().toSeq
    assert(got == want)

    // idempotent: a second run finds nothing to do
    val again = Compaction.compact(spark, path, targetBytes = 1L << 30)
    assert(again.compacted.isEmpty)
    assert(again.filesBefore == again.filesAfter)
  }

  test("big partitions keep parallel writer groups: ideal file count respects targetBytes") {
    val path = tempDir("graft-compact-big")
    PartitionedSync.writeFull(table(2000), col("grp"), path)
    // fragment one partition heavily
    (1 to 6).foreach { i =>
      table(200).filter(col("grp") === "2")
        .withColumn("id", col("id") + lit(10000L * i))
        .withColumn(PartitionedSync.PartCol, col("grp"))
        .write.mode("append").partitionBy(PartitionedSync.PartCol).parquet(path)
    }
    val bytes2 = Compaction.census(spark, path).find(_.partition == "2").get.bytes
    // pick a target that bin-packs partition 2 into ~3 files
    val target = math.max(bytes2 / 3, 1L)
    val stats = Compaction.compact(spark, path, targetBytes = target)
    assert(stats.compacted.contains("2"))
    val after = Compaction.census(spark, path).find(_.partition == "2").get
    val ideal = ((bytes2 + target - 1) / target).toInt
    assert(after.files >= 2 && after.files <= ideal,
      s"files=${after.files} ideal=$ideal")
  }
}
