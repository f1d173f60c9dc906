package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Int8Dot, Int8Pack, L2Normalize, MinHashSig, RollingHash, SimHash64}

/** SQL registration of graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(split(text, ' ')) ...")` works exactly
  * like the DataFrame API (`graft.functions.Hashes`).
  *
  * Two entry points:
  *  - `GraftFunctions.register(spark)` — imperative, for an existing
  *    session (tests, notebooks).
  *  - `spark.sql.extensions=graft.GraftExtensions` — declarative, for
  *    cluster-wide deployment (the SparkSessionExtensions path).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", { case Seq(c) => SimHash64(c) }),
    ("rolling_hash", { case Seq(c) => RollingHash(c) }),
    ("dot_product", { case Seq(a, b) => DotProduct(a, b) }),
    // minhash_sig(base_hashes, num_perm) — num_perm must fold to an
    // integer literal (signature count is a plan-time constant)
    ("minhash_sig", { case Seq(c, n) =>
      MinHashSig(c, n.eval().asInstanceOf[Number].intValue()) }),
    ("int8_pack", { case Seq(c) => Int8Pack(c) }),
    ("int8_dot", { case Seq(a, b) => Int8Dot(a, b) }),
    ("l2_normalize", { case Seq(c) => L2Normalize(c) }))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft", "simhash64"),
      { case Seq(c) => SimHash64(c) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo("graft", "rolling_hash"),
      { case Seq(c) => RollingHash(c) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft", "dot_product"),
      { case Seq(a, b) => DotProduct(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo("graft", "minhash_sig"),
      { case Seq(c, n) =>
        MinHashSig(c, n.eval().asInstanceOf[Number].intValue()) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("int8_pack"),
      new ExpressionInfo("graft", "int8_pack"),
      { case Seq(c) => Int8Pack(c) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("int8_dot"),
      new ExpressionInfo("graft", "int8_dot"),
      { case Seq(a, b) => Int8Dot(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      new ExpressionInfo("graft", "l2_normalize"),
      { case Seq(c) => L2Normalize(c) }: Seq[Expression] => Expression))
  }
}
