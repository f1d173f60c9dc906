package graft

import org.apache.spark.sql.functions._

import graft.ops.{TableStats, TimeBucketAgg, TypeInference}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("time-bucket agg buckets to epoch-aligned windows") {
    val df = Seq(
      ("2024-01-01 00:03:00", 2.0),
      ("2024-01-01 00:07:00", 4.0),
      ("2024-01-01 00:12:00", 10.0),
    ).toDF("ts_s", "value").withColumn("ts", col("ts_s").cast("timestamp"))
    val got = TimeBucketAgg.bucketed(df, "ts", "10 minutes", Seq("value"))
      .select("point_count", "value_avg").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 3.0), (1L, 10.0)))
  }

  test("numericStats computes one row of min/max/avg") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val row = TableStats.numericStats(df, Seq("x")).head()
    assert(row.getLong(0) == 3L)
    assert(row.getDouble(1) == 1.0 && row.getDouble(2) == 3.0 && row.getDouble(3) == 2.0)
  }

  test("type inference converts >=90% numeric strings, leaves others") {
    val good = (1 to 95).map(_.toString) ++ Seq.fill(5)("x")
    val bad = (1 to 50).map(_.toString) ++ Seq.fill(50)("x")
    assert(TypeInference.numericParseRate(good.toDF("s"), "s") >= 0.9)
    assert(TypeInference.numericParseRate(bad.toDF("s"), "s") < 0.9)
    val conv = TypeInference.convertIfNumeric(good.toDF("s"), "s")
    assert(conv.schema("s").dataType.typeName == "double")
    val kept = TypeInference.convertIfNumeric(bad.toDF("s"), "s")
    assert(kept.schema("s").dataType.typeName == "string")
  }
}
