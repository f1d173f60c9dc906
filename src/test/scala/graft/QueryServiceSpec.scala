package graft

import org.apache.spark.sql.functions._

import graft.api.QueryService

class QueryServiceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val svc = new QueryService(spark, sfDir)

  test("listTables / rowCount mirror the catalog") {
    assert(svc.listTables().contains("orders"))
    assert(svc.rowCount("region") == 5L)
  }

  test("queryTable: projection, deterministic order, limit") {
    val df = svc.queryTable("customer", Seq("c_custkey", "c_name"),
      limit = 7, orderBy = Seq("c_custkey"))
    assert(df.columns.toSeq == Seq("c_custkey", "c_name"))
    val keys = df.select("c_custkey").as[Long].collect()
    assert(keys.length == 7 && keys.toSeq == keys.sorted.toSeq)
  }

  test("queryTable convertTypes applies the >=90% inference rule") {
    val tmp = tempDir("graft-qs")
    (1 to 50).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t.parquet")
    val svc2 = new QueryService(spark, tmp)
    val df = svc2.queryTable("t", convertTypes = true)
    assert(df.schema("v").dataType.typeName == "double")
  }

  test("incrementalQuery: watermark filter + order, matches SyncOps") {
    val got = svc.incrementalQuery("orders", "o_orderdate",
      Some("1997-01-01 00:00:00"), limit = Some(50))
    assert(got.count() == 50)
    val dates = got.select("o_orderdate").as[java.sql.Timestamp].collect()
    assert(dates.forall(_.after(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))))
  }

  test("queryAggregated buckets and aggregates like TimeBucketAgg") {
    val agg = svc.queryAggregated("events", "ts", "1 hour", Seq("value"))
    assert(agg.columns.toSeq ==
      Seq("bucket_ts", "point_count", "value_avg", "value_min", "value_max"))
    assert(agg.count() > 0)
  }

  test("queryAggregatedLegacy parses varchar YYYYMMDDHHMMSS then buckets") {
    val tmp = tempDir("graft-qs-legacy")
    graft.core.Tables.events(spark, sfDir)
      .withColumn("ts_str", date_format(col("ts"), "yyyyMMddHHmmss"))
      .drop("ts")
      .write.mode("overwrite").parquet(s"$tmp/legacy.parquet")
    val svc2 = new QueryService(spark, tmp)
    val agg = svc2.queryAggregatedLegacy("legacy", "ts_str", "1 hour", Seq("value"))
    val direct = svc.queryAggregated("events", "ts", "1 hour", Seq("value"))
    assert(agg.count() == direct.count())
    assert(agg.join(direct, Seq("bucket_ts", "point_count"), "left_anti").count() == 0)
  }

  test("tableStats auto-detects numeric columns") {
    val stats = svc.tableStats("lineitem")
    assert(stats.columns.contains("l_quantity_avg"))
    assert(stats.count() == 1)
  }
}
