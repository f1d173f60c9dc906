package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY rules over a synced table — the
  * validation pass a sync engine runs after load (dbt-tests class:
  * not-null, accepted values, ranges, uniqueness) so drift surfaces
  * as a report, not as a downstream incident.
  *
  * Two rule kinds:
  *  - ROW rules: an assertion Column per rule (true = pass). A NULL
  *    assertion is a VIOLATION — "unknown" never passes a quality
  *    gate (the three-valued-logic trap where `col > 0` silently
  *    passes nulls).
  *  - UNIQUENESS rules: key column sets; violations = rows beyond the
  *    first per key (n_rows − distinct keys).
  *
  * Output: one row per rule — (rule, n_rows, n_violations,
  * violation_rate, pass) — the shape a scheduler alerts on.
  *
  * Scale shape: ALL row rules evaluate in ONE aggregate pass over the
  * table (map-side partial agg; the table is scanned once no matter
  * how many rules), uniqueness rules ride the same pass as
  * count-distinct aggregates; the per-rule report materializes by
  * stacking the single result row — no per-rule jobs, no joins.
  */
object QualityRules {

  /** Evaluate row assertions and uniqueness rules in one pass. */
  def check(df: DataFrame, rowRules: Seq[(String, Column)],
            uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no rules given")
    val names = (rowRules.map(_._1) ++ uniqueRules.map(_._1))
    require(names.distinct.size == names.size, s"duplicate rule names: $names")
    // aggregate aliases are INDEX-based and rule names enter the plan
    // only as lit() values — a name containing quotes, backticks, or
    // dots can neither break parsing nor inject into an expression
    val rowAggs = rowRules.map(_._2).map { assertion =>
      sum(when(coalesce(assertion, lit(false)), 0L).otherwise(1L))
    }
    val uniqAggs = uniqueRules.map(_._2).map { cols =>
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
    }
    val aggs = (rowAggs ++ uniqAggs).zipWithIndex.map { case (a, i) =>
      a.as(s"__v_$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = names.zipWithIndex.map { case (n, i) =>
      struct(lit(n).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(stacked: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.n_rows").as("n_rows"),
        col("__r.n_violations").as("n_violations"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("rule")
  }
}
