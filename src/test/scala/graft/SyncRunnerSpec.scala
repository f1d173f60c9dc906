package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sync._

/** Multi-table sync config + orchestration specs (reference:
  * table_config/service.py, application/sync_service.py).
  */
class SyncRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def srcRows(n: Int, bump: Map[Long, Int] = Map.empty) =
    (1 to n).map { i =>
      val v = bump.getOrElse(i.toLong, 0)
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${(i + v * n) / 60}%02d:${(i + v * n) % 60}%02d"),
        s"v$i-$v")
    }.toDF("id", "updated_at", "payload")

  test("TableConfig validation + repo CRUD + toggle") {
    val dir = tempDir("graft-tc")
    val repo = new TableConfigRepo(spark, dir)
    val good = TableConfig("SALES", "HISTORY", "history", "id",
      timeColumn = Some("updated_at"), description = Some("sales history"))
    assert(repo.upsert(good).isRight)
    assert(repo.upsert(good.copy(primaryKey = "")).isLeft)       // required
    assert(repo.upsert(good.copy(batchSize = 0)).isLeft)
    assert(repo.upsert(good.copy(batchSize = 200000)).isLeft)

    assert(repo.get("history").contains(good))
    assert(repo.get("history").exists(_.sourceFullName == "SALES.HISTORY"))

    repo.upsert(TableConfig("SALES", "ORDERS", "orders_t", "o_id"))
    assert(repo.all().map(_.targetTable) == Seq("history", "orders_t"))
    assert(repo.toggleSync("orders_t", enabled = false))
    assert(repo.syncTargets.map(_.targetTable) == Seq("history"))
    assert(repo.delete("orders_t"))
    assert(repo.all().size == 1)
    assert(!repo.toggleSync("missing", enabled = true))
  }

  test("full sync then incremental: watermark advances, upsert keeps latest per pk") {
    val srcDir = tempDir("graft-runner-src")
    val tgtDir = tempDir("graft-runner-tgt")
    val stateDir = tempDir("graft-runner-state")
    val logDir = tempDir("graft-runner-log")
    val state = new StateStore(spark, stateDir)
    val log = new SyncLogRepo(spark, logDir)
    val runner = new SyncRunner(spark,
      cfg => spark.read.parquet(s"$srcDir/${cfg.sourceTable}.parquet"),
      tgtDir, state, log)
    val cfg = TableConfig("S", "t", "t_sync", "id", timeColumn = Some("updated_at"))

    // first run: full
    srcRows(10).write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = runner.syncTable(cfg)
    assert(r1.syncType == "full" && r1.status == "completed" && r1.totalRows == 10)
    assert(state.loadWatermark("t_sync").isDefined)
    assert(runner.target(cfg).count() == 10)

    // source gains 5 new rows AND updates row 3 (newer timestamp)
    srcRows(15, bump = Map(3L -> 1)).write.mode("overwrite")
      .parquet(s"$srcDir/t.parquet")
    val r2 = runner.syncTable(cfg)
    assert(r2.syncType == "incremental" && r2.status == "completed")
    assert(r2.totalRows == 6) // 5 new + 1 updated past the watermark
    val tgt = runner.target(cfg)
    assert(tgt.count() == 15) // upsert: no duplicate for id=3
    assert(tgt.filter(col("id") === 3).select("payload").as[String].head() == "v3-1")

    // nothing new: zero-row incremental, target untouched
    val r3 = runner.syncTable(cfg)
    assert(r3.syncType == "incremental" && r3.totalRows == 0)
    assert(runner.target(cfg).count() == 15)

    // audit trail holds all three runs in order
    assert(log.recentLogs(10, Some("t_sync")).map(_.syncType) ==
      Seq("incremental", "incremental", "full"))
  }

  test("partitioned sync: full then incremental rewrites only affected partitions") {
    val srcDir = tempDir("graft-psr-src")
    val tgtDir = tempDir("graft-psr-tgt")
    val state = new StateStore(spark, tempDir("psr-st"))
    val log = new SyncLogRepo(spark, tempDir("psr-lg"))
    val runner = new SyncRunner(spark,
      cfg => spark.read.parquet(s"$srcDir/${cfg.sourceTable}.parquet"),
      tgtDir, state, log)
    val cfg = TableConfig("S", "t", "t_part", "id", timeColumn = Some("updated_at"))
    val bucket = date_format(col("updated_at"), "yyyy-MM")
    def df(rs: (Long, String, String)*) = rs.map { case (i, ts, v) =>
      (i, Timestamp.valueOf(ts), v)
    }.toDF("id", "updated_at", "payload")

    df((1, "2024-01-10 00:00:00", "a"), (2, "2024-02-10 00:00:00", "b"),
       (3, "2024-03-10 00:00:00", "c"))
      .write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r1 = runner.syncTablePartitioned(cfg, bucket)
    assert(r1.syncType == "full" && r1.status == "completed" && r1.totalRows == 3)
    assert(state.loadWatermark("t_part").exists(_.startsWith("2024-03-10")))
    val partDir = new java.io.File(s"$tgtDir/t_part.parquet", "__part=2024-02")
    val before = partDir.listFiles().map(f => f.getName -> f.lastModified()).toMap

    // source gains a 2024-04 row AND moves id=1 forward (stale version
    // in 2024-01 must vanish; 2024-02/03 stay byte-identical)
    df((1, "2024-01-10 00:00:00", "a"), (2, "2024-02-10 00:00:00", "b"),
       (3, "2024-03-10 00:00:00", "c"),
       (4, "2024-04-05 00:00:00", "d"), (1, "2024-04-06 00:00:00", "a2"))
      .write.mode("overwrite").parquet(s"$srcDir/t.parquet")
    val r2 = runner.syncTablePartitioned(cfg, bucket)
    assert(r2.syncType == "incremental" && r2.totalRows == 2)
    assert(partDir.listFiles().map(f => f.getName -> f.lastModified()).toMap == before)
    val got = PartitionedSync.read(spark, s"$tgtDir/t_part.parquet")
      .select("id", "payload").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(state.loadWatermark("t_part").exists(_.startsWith("2024-04-06")))

    // nothing new: zero-row incremental, watermark unchanged
    val r3 = runner.syncTablePartitioned(cfg, bucket)
    assert(r3.syncType == "incremental" && r3.totalRows == 0)
    assert(state.loadWatermark("t_part").exists(_.startsWith("2024-04-06")))
  }

  test("testSync: row-limited, watermark untouched, next full sync unaffected") {
    val srcDir = tempDir("graft-test-src")
    val tgtDir = tempDir("graft-test-tgt")
    val state = new StateStore(spark, tempDir("ts"))
    val log = new SyncLogRepo(spark, tempDir("tl"))
    val runner = new SyncRunner(spark,
      cfg => spark.read.parquet(s"$srcDir/${cfg.sourceTable}.parquet"),
      tgtDir, state, log)
    val cfg = TableConfig("S", "t", "t_sync", "id", timeColumn = Some("updated_at"))
    srcRows(50).write.mode("overwrite").parquet(s"$srcDir/t.parquet")

    // smoke run: target holds <= rowLimit rows, audit says "test",
    // no watermark appears
    val r = runner.testSync(cfg, rowLimit = 7)
    assert(r.syncType == "test" && r.status == "completed" && r.totalRows == 7)
    assert(runner.target(cfg).count() == 7)
    assert(state.loadWatermark("t_sync").isEmpty)

    // a limit above the source size takes everything, no error
    assert(runner.testSync(cfg, rowLimit = 1000).totalRows == 50)

    // the next real sync is a FULL one (no watermark was written) and
    // sees the complete source, not the rehearsal slice
    val full = runner.syncTable(cfg)
    assert(full.syncType == "full" && full.totalRows == 50)
    assert(state.loadWatermark("t_sync").isDefined)

    // after a real watermark exists, a test run still must not move it
    val wmBefore = state.loadWatermark("t_sync").get
    runner.testSync(cfg, rowLimit = 3)
    assert(state.loadWatermark("t_sync").contains(wmBefore))

    assert(log.recentLogs(10, Some("t_sync")).map(_.syncType) ==
      Seq("test", "full", "test", "test"))
    assert(intercept[IllegalArgumentException](
      runner.testSync(cfg, rowLimit = 0)).getMessage.contains("rowLimit"))
  }

  test("syncAll runs enabled targets, skips disabled, survives one failure") {
    val srcDir = tempDir("graft-runner2-src")
    val tgtDir = tempDir("graft-runner2-tgt")
    val state = new StateStore(spark, tempDir("s"))
    val log = new SyncLogRepo(spark, tempDir("l"))
    val repo = new TableConfigRepo(spark, tempDir("c"))
    repo.upsert(TableConfig("S", "a", "a_sync", "id"))
    repo.upsert(TableConfig("S", "missing", "b_sync", "id")) // source won't exist
    repo.upsert(TableConfig("S", "c", "c_sync", "id", syncEnabled = false))
    srcRows(4).write.mode("overwrite").parquet(s"$srcDir/a.parquet")

    val runner = new SyncRunner(spark,
      cfg => spark.read.parquet(s"$srcDir/${cfg.sourceTable}.parquet"),
      tgtDir, state, log)
    val results = runner.syncAll(repo)
    assert(results.size == 2) // c_sync skipped entirely
    val byTable = results.map(e => e.table -> e.status).toMap
    assert(byTable("a_sync") == "completed")
    assert(byTable("b_sync") == "failed")
    assert(log.entries().forall(_.table != "c_sync"))

    val st = runner.status()
    assert(st.map(_._1.table) == Seq("a_sync", "b_sync"))
    assert(st.find(_._1.table == "a_sync").exists(_._2.completed == 1))
  }
}
