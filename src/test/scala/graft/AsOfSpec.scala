package graft

import graft.queries.{Analytics, AsOf}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("merge as-of join == composed window as-of join") {
    val composed = Analytics.asofJoin(spark, sfDir)
      .select("event_id", "o_orderkey", "o_orderdate")
      .as[(Long, Option[Long], Option[java.sql.Timestamp])].collect().toSet
    val merged = AsOf.asofJoinMerged(spark, sfDir)
      .select("event_id", "o_orderkey", "o_orderdate")
      .as[(Long, Option[Long], Option[java.sql.Timestamp])].collect().toSet
    assert(merged == composed)
    assert(merged.nonEmpty)
  }

  test("generic asofJoinTables == composed oracle baseline on events/orders") {
    val e = graft.core.Tables.events(spark, sfDir).select("event_id", "ts", "user_id")
    val o = graft.core.Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate")
    val generic = AsOf.asofJoinTables(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey"))
      .select("event_id", "o_orderkey", "o_orderdate")
      .as[(Long, Option[Long], Option[java.sql.Timestamp])].collect().toSet
    val composed = Analytics.asofJoin(spark, sfDir)
      .select("event_id", "o_orderkey", "o_orderdate")
      .as[(Long, Option[Long], Option[java.sql.Timestamp])].collect().toSet
    assert(generic == composed)
  }

  test("generic asofJoinTables: no-match rows keep nulls, clash rejected") {
    val left = Seq((1L, 10L, 100L), (2L, 5L, 100L)).toDF("lid", "lt", "k")
    val right = Seq((100L, 7L, "a"), (100L, 9L, "b")).toDF("rk", "rt", "v")
    val got = AsOf.asofJoinTables(left, right, "k", "rk", "lt", "rt")
      .select("lid", "v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("b")) // rt=9 is the latest <= 10
    assert(got(2L).isEmpty)       // nothing <= 5
    intercept[IllegalArgumentException] {
      AsOf.asofJoinTables(left, left.withColumnRenamed("lid", "rid"), "k", "k", "lt", "lt")
    }
  }
}
