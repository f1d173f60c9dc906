package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-located join of bucketed tables plans with zero shuffle") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "okey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "okey")
    Bucketing.writeBucketed(li, "b_lineitem", 4, Seq("okey"), Seq("okey"))
    Bucketing.writeBucketed(o, "b_orders", 4, Seq("okey"), Seq("okey"))
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", Seq("okey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      val direct = li.join(o, Seq("okey")).count()
      assert(joined.count() == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
