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
    val rowAggs = rowRules.map { case (n, assertion) =>
      sum(when(coalesce(assertion, lit(false)), 0L).otherwise(1L)).as(s"__v_$n")
    }
    val uniqAggs = uniqueRules.map { case (n, cols) =>
      (count(lit(1)) - countDistinct(struct(cols.map(col): _*))).as(s"__v_$n")
    }
    val one = df.agg(count(lit(1)).as("__n"), (rowAggs ++ uniqAggs): _*)
    val stacked = names.map(n => s"'$n', __n, `__v_$n`").mkString(", ")
    one.select(expr(
        s"stack(${names.size}, $stacked) AS (rule, n_rows, n_violations)"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("rule")
  }
}
