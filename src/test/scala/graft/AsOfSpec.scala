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

  test("generic asofJoinTables: SQL null semantics for keys and times") {
    val left = Seq(
      (1L, 10L, Some(100L)),
      (2L, 10L, None),          // null key -> null-extended, matches nothing
      (3L, 10L, Some(200L)),
    ).toDF("lid", "lt", "k")
    val right = Seq(
      (Some(100L), Some(5L), "a"),
      (Some(100L), None, "ghost"),  // null time can never be "most recent"
      (None, Some(1L), "nullkey"),  // null key matches nothing
      (Some(200L), Some(9L), "b"),
    ).toDF("rk", "rt", "v")
    val got = AsOf.asofJoinTables(left, right, "k", "rk", "lt", "rt")
      .select("lid", "v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("a"))
    assert(got(2L).isEmpty)     // null-key left row survives, null-extended
    assert(got(3L).contains("b"))
    assert(!got.values.flatten.exists(v => v == "ghost" || v == "nullkey"))
  }

  test("generic asofJoinTables: DATE right column vs TIMESTAMP left column") {
    // the 1000x trap: ms-scaled dates vs us-scaled timestamps would
    // sort every date "before" every timestamp and mis-match
    val left = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 12:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 7L),
    ).toDF("lid", "lt", "k")
    val right = Seq(
      (7L, java.sql.Date.valueOf("2024-01-01"), "early"),
      (7L, java.sql.Date.valueOf("2024-01-04"), "mid"),
      (7L, java.sql.Date.valueOf("2024-01-09"), "late"),
    ).toDF("rk", "rt", "v")
    val got = AsOf.asofJoinTables(left, right, "k", "rk", "lt", "rt")
      .select("lid", "v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("mid"))   // 2024-01-04 <= Jan 5 noon < Jan 9
    assert(got(2L).contains("early")) // only Jan 1 precedes Jan 2
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
