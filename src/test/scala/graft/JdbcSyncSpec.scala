package graft

import org.apache.spark.sql.functions.col

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

  // ---- live embedded-Derby round trips: the options/SQL built above
  // actually executing through spark.read.jdbc (reference pulls live
  // from Oracle at oracle_source.py:239; Derby stands in as the
  // in-process ANSI database — its jars ship with Spark).

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"
  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def withDerby[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(derbyUrl)
    try f(conn) finally conn.close()
  }

  private def freshEvents(n: Int): Unit = withDerby { conn =>
    val st = conn.createStatement()
    try {
      try st.execute("DROP TABLE EVENTS") catch { case _: java.sql.SQLException => () }
      st.execute(
        "CREATE TABLE EVENTS (ID INT PRIMARY KEY, TS_STR VARCHAR(14), VAL DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO EVENTS VALUES (?, ?, ?)")
      (1 to n).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, f"20240101${i / 3600}%02d${(i / 60) % 60}%02d${i % 60}%02d")
        ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      ins.close()
    } finally st.close()
  }

  test("live Derby: partitioned read executes N range cursors and predicates push down") {
    freshEvents(100)
    val opts = JdbcSync.partitionedReadOptions(derbyUrl, "EVENTS", "ID", 1, 101, 4) +
      ("driver" -> derbyDriver)
    val df = JdbcSync.read(spark, opts)
    assert(df.rdd.getNumPartitions == 4) // four concurrent range-predicated cursors
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("VAL")).head().getDouble(0)
      == (1 to 100).map(_ * 1.5).sum)
    // a caller-side filter reaches the remote WHERE clause (V1 JDBC
    // pushdown) — visible as PushedFilters in the formatted plan
    val filtered = df.filter(col("ID") > 90)
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"), s"no pushdown in:\n$plan")
  }

  test("live Derby: incrementalQuery subquery pulls only the tail past the watermark") {
    freshEvents(100)
    // watermark = row 90's ts string → the remote engine sees only 10 rows
    val wm = f"20240101${90 / 3600}%02d${(90 / 60) % 60}%02d${90 % 60}%02d"
    val sub = JdbcSync.incrementalQuery("EVENTS", "TS_STR", wm)
    val inc = JdbcSync.read(spark, Map(
      "url" -> derbyUrl, "driver" -> derbyDriver, "dbtable" -> sub))
    assert(inc.count() == 10)
    assert(inc.agg(org.apache.spark.sql.functions.min("ID")).head().getInt(0) == 91)
  }

  test("live Derby: quoted hostile identifiers execute, not just escape") {
    withDerby { conn =>
      val st = conn.createStatement()
      try {
        try st.execute("""DROP TABLE "we""ird tab"""")
        catch { case _: java.sql.SQLException => () }
        // table and column names that MUST be quoted to be valid SQL
        st.execute("""CREATE TABLE "we""ird tab" ("TS COL" VARCHAR(14), "SEL ECT" INT)""")
        st.execute("""INSERT INTO "we""ird tab" VALUES ('20240101000001', 1), ('20240101000002', 2)""")
      } finally st.close()
    }
    val sub = JdbcSync.incrementalQuery("""we"ird tab""", "TS COL", "20240101000001")
    val df = JdbcSync.read(spark, Map(
      "url" -> derbyUrl, "driver" -> derbyDriver, "dbtable" -> sub))
    assert(df.count() == 1)
    assert(df.select("SEL ECT").head().getInt(0) == 2)
  }

  test("live Derby: SyncRunner full→incremental cycle + testSync row limit through JDBC") {
    import graft.sync._
    freshEvents(60)
    val tgtDir = tempDir("graft-jdbc-tgt")
    val state = new StateStore(spark, tempDir("js"))
    val log = new SyncLogRepo(spark, tempDir("jl"))
    val runner = new SyncRunner(spark,
      cfg => JdbcSync.read(spark, Map(
        "url" -> derbyUrl, "driver" -> derbyDriver, "dbtable" -> cfg.sourceTable)),
      tgtDir, state, log)
    val cfg = TableConfig("APP", "EVENTS", "events_sync", "ID",
      timeColumn = Some("TS_STR"))

    // smoke rehearsal first: bounded pull, no watermark left behind
    val smoke = runner.testSync(cfg, rowLimit = 5)
    assert(smoke.status == "completed" && smoke.totalRows == 5)
    assert(state.loadWatermark("events_sync").isEmpty)

    val full = runner.syncTable(cfg)
    assert(full.syncType == "full" && full.totalRows == 60)

    // 15 fresh rows arrive at the source; incremental pulls exactly those
    withDerby { conn =>
      val ins = conn.prepareStatement("INSERT INTO EVENTS VALUES (?, ?, ?)")
      (61 to 75).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, f"20240101${i / 3600}%02d${(i / 60) % 60}%02d${i % 60}%02d")
        ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      ins.close()
    }
    val inc = runner.syncTable(cfg)
    assert(inc.syncType == "incremental" && inc.totalRows == 15)
    assert(runner.target(cfg).count() == 75)
  }

  test("writeSnapshot round-trips a partitioned parquet snapshot") {
    val dir = tempDir("graft-snap")
    val df = Seq((1L, "a", "2024-01"), (2L, "b", "2024-01"), (3L, "c", "2024-02"))
      .toDF("id", "v", "month")
    JdbcSync.writeSnapshot(df, dir, Seq("month"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.select("month").distinct().count() == 2)
  }
}
