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
}
