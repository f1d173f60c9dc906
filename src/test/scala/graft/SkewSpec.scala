package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // skewed facts: key 1 holds 80 of 100 rows
  private def facts = (0 until 100).map { i =>
    (i.toLong, if (i < 80) 1L else (i % 5).toLong, i * 1.0)
  }.toDF("row_id", "k", "v")

  private def dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"),
    (3L, "three"), (4L, "four")).toDF("k", "k_name")

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = facts.join(dim, Seq("k"))
      .select("row_id", "k", "v", "k_name").as[(Long, Long, Double, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), "row_id", 8)
      .select("row_id", "k", "v", "k_name").as[(Long, Long, Double, String)]
      .collect().toSet
    assert(salted == plain)
  }

  test("saltedSumCount equals direct aggregation") {
    val direct = facts.groupBy("k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n_rows"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(facts, Seq("k"), "v", "row_id", 8)
      .as[(Long, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val top = Skew.keySkewProfile(facts, Seq("k"), 3)
      .select("k", "n_rows", "share").as[(Long, Long, Double)].collect()
    assert(top.head == ((1L, 84L, 0.84))) // 80 skewed + four i%5==1 rows
  }
}
