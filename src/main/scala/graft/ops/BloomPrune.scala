package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pruned EXACT semi / anti joins — the blocklist /
  * decontamination shape at corpus scale: "drop (or keep) every row
  * whose key appears in a reference set" where the big side is the
  * 100 TB corpus and the reference set is large enough that an exact
  * broadcast set is uncomfortable, but its BLOOM fingerprint (~1.2 MB
  * per million keys at 1% fpp) broadcasts trivially.
  *
  * Results are EXACT, not approximate: the bloom only removes
  * definite-negatives before the join; every "maybe" (true hits plus
  * the fpp tail) is re-checked by a real equi-join. That is why both
  * paths are oracle-checkable against plain SQL [anti] joins.
  *
  * Mechanics: both sides hash the key with `xxhash64` and the filter
  * is Spark's own codegen'd [[BloomFilterMightContain]] over a foldable
  * binary literal — the exact machinery Catalyst's runtime-filter
  * injection uses, so the probe stays inside WholeStageCodegen. The
  * bloom is built DISTRIBUTED (`stat.bloomFilter` tree-aggregates
  * per-partition filters); only the merged bitset lands on the driver.
  *
  * 100 TB accounting:
  *  - semiJoin: one corpus scan; only bloom survivors (hits + fpp·N
  *    rows) enter the shuffle — with a 0.1% hit rate and fpp 1%, the
  *    join moves ~1% of the corpus instead of all of it.
  *  - antiJoin: definite-negatives bypass the join entirely; the plan
  *    reads the corpus twice (once per branch) but shuffles only the
  *    maybes. Two cheap columnar scans beat one full-corpus shuffle —
  *    scan bandwidth is the commodity, shuffle is the bottleneck.
  *  - fpp trades bloom size against re-check traffic; 0.01 is a good
  *    default. Size the bloom from the TRUE key count: pass
  *    `expectedKeys` when known to skip the sizing count job.
  *
  * Reference behavior anchor: the reference filters sync rows against
  * in-memory key sets (sync_engine.py upsert key handling); this is
  * that operation rebuilt for key sets that no longer fit memory.
  */
object BloomPrune {

  /** Membership predicate: true = `probe`'s value MAY be in
    * `keys.keyCol` (false = definitely not). Builds the bloom on the
    * spot; reuse the returned Column across branches of one plan.
    * `probe` must be the SAME data type as `keyCol` (xxhash64 hashes
    * raw typed bytes — a mismatch makes true members hash differently
    * and report definitely-not); [[semiJoin]]/[[antiJoin]] assert it.
    */
  def bloomMight(keys: DataFrame, keyCol: String, probe: Column,
                 fpp: Double = 0.01,
                 expectedKeys: Option[Long] = None): Column = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    expectedKeys.foreach(n =>
      require(n > 0, s"expectedKeys must be positive, got $n"))
    // key count bounds the bitset; an undercount only raises fpp (more
    // re-check traffic), never correctness
    val n = expectedKeys.getOrElse(keys.select(col(keyCol)).count()) max 1L
    val hashed = keys.select(xxhash64(col(keyCol)).as("__bloom_h"))
    val bf = hashed.stat.bloomFilter("__bloom_h", n, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    column(BloomFilterMightContain(
      Literal.create(out.toByteArray, BinaryType),
      expression(xxhash64(probe))))
  }

  /** Both sides of the bloom probe MUST hash identical bytes: if
    * `bigKey`'s type differs from `keys.keyCol`'s (e.g. int vs
    * string), true matches hash differently, the bloom reports
    * definitely-not, and rows a plain join (with implicit cast) would
    * keep are silently dropped. Fail loudly instead — the caller
    * casts one side explicitly.
    */
  private def requireSameKeyType(big: DataFrame, bigKey: Column,
                                 keys: DataFrame, keyCol: String): Unit = {
    val bt = big.select(bigKey).schema.head.dataType
    val kt = keys.schema(keyCol).dataType
    require(bt == kt,
      s"bloom key types must match exactly (got $bt vs $kt for '$keyCol'): " +
        "a type-coerced equi-join would still match, but the bloom hashes " +
        "raw typed bytes and would silently drop true matches — cast one " +
        "side explicitly")
  }

  /** Rows of `big` whose `bigKey` value appears in `keys.keyCol` —
    * exact left-semi join, bloom-pruned before the shuffle. `bigKey`
    * may be any expression over `big`'s columns (e.g. `md5($"text")`)
    * but must resolve to exactly `keyCol`'s type (asserted).
    */
  def semiJoin(big: DataFrame, keys: DataFrame, bigKey: Column,
               keyCol: String, fpp: Double = 0.01,
               expectedKeys: Option[Long] = None): DataFrame = {
    requireSameKeyType(big, bigKey, keys, keyCol)
    val k = keys.select(col(keyCol).as("__bloom_key"))
    big.filter(bloomMight(keys, keyCol, bigKey, fpp, expectedKeys))
      .join(k, bigKey === col("__bloom_key"), "left_semi")
  }

  /** Rows of `big` whose `bigKey` value does NOT appear in
    * `keys.keyCol` — exact anti join. Definite-negatives (the vast
    * majority under a blocklist workload) skip the join; only bloom
    * maybes are re-checked.
    */
  def antiJoin(big: DataFrame, keys: DataFrame, bigKey: Column,
               keyCol: String, fpp: Double = 0.01,
               expectedKeys: Option[Long] = None): DataFrame = {
    requireSameKeyType(big, bigKey, keys, keyCol)
    val might = bloomMight(keys, keyCol, bigKey, fpp, expectedKeys)
    val k = keys.select(col(keyCol).as("__bloom_key"))
    val maybes = big.filter(might)
      .join(k, bigKey === col("__bloom_key"), "left_anti")
    big.filter(!might).unionByName(maybes)
  }
}
