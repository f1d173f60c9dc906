package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample`/`sampleBy` draw from a per-partition RNG stream, so the
  * selected ROWS change whenever partitioning changes — unacceptable
  * for reproducible dataset builds. These helpers hash a stable id
  * instead: the same row is in or out of the sample on any cluster
  * size, partitioning, or execution order, and the decision is a
  * pushdown-friendly codegen'd filter (no shuffle).
  */
object Sampling {

  private def bucket(idCol: String, salt: String) =
    pmod(xxhash64(concat_ws("|", lit(salt), col(idCol))), lit(1000000L))

  /** Keep ~`fraction` of rows, selected by id hash. `salt` decorrelates
    * independent samples over the same corpus.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "s0"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.filter(bucket(idCol, salt) < (fraction * 1000000L).toLong)
  }

  /** Per-stratum fractions (e.g. per language), same hash mechanism.
    * Strata absent from `fractions` are dropped.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double],
                       salt: String = "s0"): DataFrame = {
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(bucket(idCol, salt) < threshold)
  }

  /** Deterministic train/validation/test split: disjoint, exhaustive,
    * stable under any partitioning.
    */
  def split3(df: DataFrame, idCol: String, trainFrac: Double, valFrac: Double,
             salt: String = "split"): (DataFrame, DataFrame, DataFrame) = {
    val b = bucket(idCol, salt)
    val t = (trainFrac * 1000000L).toLong
    val v = ((trainFrac + valFrac) * 1000000L).toLong
    (df.filter(b < t), df.filter(b >= t && b < v), df.filter(b >= v))
  }
}
