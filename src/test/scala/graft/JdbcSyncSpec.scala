package graft

import graft.sources.JdbcSync

class JdbcSyncSpec extends SparkSpec {
  import spark.implicits._

  test("partitionedReadOptions builds a complete range-scan spec") {
    val opts = JdbcSync.partitionedReadOptions(
      "jdbc:oracle:thin:@host:1521/svc", "SALES.HISTORY", "ID",
      0L, 1000000L, 64)
    assert(opts("partitionColumn") == "ID")
    assert(opts("numPartitions") == "64")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "1000000")
    intercept[IllegalArgumentException] {
      JdbcSync.partitionedReadOptions("u", "t", "c", 10, 0, 4)
    }
  }

  test("incrementalQuery escapes quotes and wraps as a subquery") {
    val q = JdbcSync.incrementalQuery("HISTORY", "TS", "2024-01-01 00:00:00")
    assert(q == "(SELECT * FROM HISTORY WHERE TS > '2024-01-01 00:00:00') sync_src")
    assert(JdbcSync.incrementalQuery("T", "C", "o'clock").contains("'o''clock'"))
  }

  test("incrementalQuery neutralizes hostile identifiers") {
    // plain and schema-qualified identifiers pass through unquoted
    assert(JdbcSync.incrementalQuery("SALES.HISTORY", "TS", "x")
      .startsWith("(SELECT * FROM SALES.HISTORY WHERE TS"))
    // injection-shaped names are wrapped whole in double quotes — the
    // payload stays inert inside a quoted identifier
    val hostile = JdbcSync.incrementalQuery("t; DROP TABLE x--", "TS", "v")
    assert(hostile.contains("FROM \"t; DROP TABLE x--\" WHERE"))
    // embedded double quotes cannot close the identifier early
    val quoted = JdbcSync.incrementalQuery("""t"ick""", "TS", "v")
    assert(quoted.contains("FROM \"t\"\"ick\" WHERE"))
    // hostile time column is quoted too
    assert(JdbcSync.incrementalQuery("T", "c OR 1=1", "v")
      .contains("WHERE \"c OR 1=1\" >"))
    // control characters are rejected, not passed through
    intercept[IllegalArgumentException] {
      JdbcSync.incrementalQuery("t\nx", "TS", "v")
    }
  }

  test("writeSnapshot round-trips a partitioned parquet snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val df = Seq((1L, "a", "2024-01"), (2L, "b", "2024-01"), (3L, "c", "2024-02"))
      .toDF("id", "v", "month")
    JdbcSync.writeSnapshot(df, dir, Seq("month"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.select("month").distinct().count() == 2)
  }
}
