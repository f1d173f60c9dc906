package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared hashing kernels: tight loops over UTF8String bytes, called
  * from BOTH the interpreted eval path and generated Java (a top-level
  * Scala object exposes static forwarders, so `HashKernels.f(x)` is a
  * valid Java call inside whole-stage codegen).
  */
object HashKernels {

  /** 64-bit SimHash over an array<string> of tokens: token hashes via
    * the engine's xxhash64 family, one signed vote per bit, sign → bit.
    */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** All `numPerm` MinHash permutation minima in ONE pass over the
    * base-hash array. Value-identical to the per-permutation
    * `array_min(transform(base, h -> xxhash64(i, h)))` formulation:
    * Spark's XxHash64 chains seed 42 → hashInt(i) → hashLong(h), and
    * `seeds` carries the precomputed per-permutation intermediate.
    * Empty input yields all-null minima (array_min of empty is null).
    */
  def minhashSig(base: ArrayData, seeds: Array[Long]): GenericArrayData = {
    val n = base.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](seeds.length))
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    var e = 0
    while (e < n) {
      if (!base.isNullAt(e)) {
        val h = base.getLong(e)
        var i = 0
        while (i < seeds.length) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins.map(Long.box))
  }

  /** The chained xxhash64 seed after hashing permutation index `i`. */
  def minhashSeeds(numPerm: Int): Array[Long] =
    Array.tabulate(numPerm)(i => XXH64.hashInt(i, 42L))

  /** Distinct xxhash64 values of a text's word k-grams, straight off
    * the text's BYTE RANGES. A k-gram joined by ' ' is, by
    * construction of `split(text, ' ')`, exactly the byte substring
    * from its first word's start to its last word's end — so hashing
    * the range is value-identical to
    * `array_distinct(transform(sequence(0, greatest(n - k, 0)),
    *    i -> xxhash64(array_join(slice(words, i + 1, k), ' '))))`
    * while materializing NO per-gram strings and no word array.
    * (0x20 never occurs inside a multi-byte UTF-8 sequence, so byte
    * scanning for spaces is character-correct; consecutive spaces
    * yield the same empty words `split` produces.) Distinctness keeps
    * first occurrence, matching `array_distinct` on the gram strings
    * modulo 64-bit hash collisions — the same tolerance every
    * downstream consumer (MinHash, Jaccard-on-hashes) already accepts.
    */
  def gramHashes(s: UTF8String, k: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // space positions = word boundaries; m spaces → m + 1 words
    var spaces = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte) {
        if (m == spaces.length) spaces = java.util.Arrays.copyOf(spaces, m * 2)
        spaces(m) = i
        m += 1
      }
      i += 1
    }
    val nWords = m + 1
    val nGrams = math.max(nWords - k, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new java.util.ArrayList[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val start = if (g == 0) 0 else spaces(g - 1) + 1
      val last = g + k - 1 // last word index in the gram
      val end = if (last < m) spaces(last) else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      if (seen.add(h)) out.add(h)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Distinct PORTABLE word-k-gram hashes of a text: md5 of each gram's
    * bytes, first 15 hex digits as a 60-bit integer, mod 2^31 —
    * value-identical (same SET, same first-occurrence order) to
    * `array_distinct(transform(shingles,
    *    s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    *         % 2147483648))`
    * over `shingles = array_distinct(gram strings)`, because deduping
    * by hash value subsumes deduping the strings first. Same byte-range
    * identity as [[gramHashes]] (a ' '-joined gram IS the byte
    * substring), so no per-gram string, hex string, or decimal-conv
    * string is ever materialized — md5 runs straight on the text's
    * byte ranges. The first 15 hex digits are digest nibbles 0..14 =
    * (first 8 digest bytes as unsigned big-endian) >>> 4.
    */
  def gramMd5Mod31(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var spaces = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20.toByte) {
        if (m == spaces.length) spaces = java.util.Arrays.copyOf(spaces, m * 2)
        spaces(m) = i
        m += 1
      }
      i += 1
    }
    val nGrams = math.max(m + 1 - k, 0) + 1
    val md = md5Local.get()
    val dg = new Array[Byte](16)
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new java.util.ArrayList[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val start = if (g == 0) 0 else spaces(g - 1) + 1
      val last = g + k - 1
      val end = if (last < m) spaces(last) else len
      md.reset()
      md.update(bytes, start, end - start)
      md.digest(dg, 0, 16)
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (dg(b) & 0xffL); b += 1 }
      val h = (top >>> 4) & 0x7fffffffL // 60-bit value mod 2^31
      if (seen.add(h)) out.add(h)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** All `numPerm` PORTABLE MinHash permutation minima in ONE pass —
    * value-identical to
    * `transform(sequence(0, numPerm-1), i -> array_min(transform(hs,
    *    h -> ((2*i + 1) * h + (i * 2654435761) % 2147483647)
    *         % 2147483647)))`
    * (odd multipliers, Knuth-constant offsets, p = 2^31 − 1; every
    * product < 2^38 — exact in any engine's 64-bit integer). Empty
    * input yields all-null minima (array_min of empty is null).
    */
  def minhashSigPortable(hs: ArrayData, numPerm: Int): GenericArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numPerm))
    val p = 2147483647L
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var e = 0
    while (e < n) {
      if (!hs.isNullAt(e)) {
        val h = hs.getLong(e)
        var i = 0
        while (i < numPerm) {
          val v = ((2 * i + 1) * h + (i * 2654435761L) % p) % p
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins.map(Long.box))
  }

  /** Polynomial rolling hash (base 1000003, mod 2^64 by wraparound)
    * over a string's UTF-8 bytes.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1469598103934665603L // FNV offset basis as a non-zero seed
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** POSITIONAL per-gram [[rollingHash]] values over a text's word
    * k-gram byte ranges — the winnowing front end. Same byte-range
    * identity as [[gramHashes]], but keeps every gram in order (window
    * selection needs positions) and uses the SIGNED polynomial kernel
    * the winnowing oracle mirrors in HUGEINT. Gram i (0-based) covers
    * words [i, i+k) CLAMPED to the last word — short docs produce one
    * whole-text gram — matching
    * `transform(sequence(1, greatest(n - k + 1, 1)),
    *    i -> rolling_hash(array_join(slice(words, i, k), ' ')))`.
    */
  def gramRollingHashes(s: UTF8String, k: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte) {
        if (m == spaces.length) spaces = java.util.Arrays.copyOf(spaces, m * 2)
        spaces(m) = i
        m += 1
      }
      i += 1
    }
    val nGrams = math.max(m + 1 - k, 0) + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val start = if (g == 0) 0 else spaces(g - 1) + 1
      val last = g + k - 1
      val end = if (last < m) spaces(last) else len
      var h = 1469598103934665603L
      var j = start
      while (j < end) {
        h = h * 1000003L + (org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xff)
        j += 1
      }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram STRINGS of a text, by byte range — the token-stream
    * front end (TF-IDF, heavy hitters). Equal to
    * `CASE WHEN size(words) >= n THEN transform(sequence(0,
    * size(words) - n), i -> array_join(slice(words, i + 1, n), ' '))
    * ELSE array() END` — note NO short-doc clamp (docs with fewer than
    * n words emit nothing), unlike [[gramHashes]]' shingle contract.
    * Each gram is one byte-range copy; the word array, the per-gram
    * slice arrays, and the interpreted lambda dispatch all disappear.
    */
  def gramStrings(s: UTF8String, n: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte) {
        if (m == spaces.length) spaces = java.util.Arrays.copyOf(spaces, m * 2)
        spaces(m) = i
        m += 1
      }
      i += 1
    }
    val nWords = m + 1
    if (nWords < n) return new GenericArrayData(new Array[Any](0))
    val nGrams = nWords - n + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val start = if (g == 0) 0 else spaces(g - 1) + 1
      val last = g + n - 1
      val end = if (last < m) spaces(last) else len
      val bytes = new Array[Byte](end - start)
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off + start, bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        end - start)
      out(g) = UTF8String.fromBytes(bytes)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Regroup a single-space-tokenized text into lines of `every`
    * words: every `every`-th space becomes '\n'. Byte-identical to
    * `array_join(transform(sequence(1, ceil(size(words)/every)),
    *   g -> array_join(slice(words, (g-1)*every+1, every), ' ')), '\n')`
    * — one pass, one allocation, no word/line arrays.
    */
  def regroupWords(s: UTF8String, every: Int): UTF8String = {
    val bytes = s.getBytes.clone()
    var nSpaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20.toByte) {
        nSpaces += 1
        if (nSpaces % every == 0) bytes(i) = 0x0a.toByte
      }
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }

  /** Distinct window-of-w minima of a long array, first-occurrence
    * order — the winnowing fingerprint SET (positions dropped), equal
    * to `array_distinct(transform(sequence(0, greatest(n - w, 0)),
    * j -> array_min(slice(hs, j + 1, w))))`. O(n·w) like the
    * expression form; w is small (4) and the scan dominates.
    */
  def windowMinDistinct(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    // n = 0: no grams → no fingerprints. (The SQL mirror would emit
    // [NULL] — array_min of an empty slice — so the equivalence above
    // holds only for n >= 1; callers always pass >= 1 gram.)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nWin = math.max(n - w, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new java.util.ArrayList[Any](nWin)
    var j = 0
    while (j < nWin) {
      var mn = Long.MaxValue
      var i = j
      val end = math.min(j + w, n)
      while (i < end) {
        val v = arr.getLong(i)
        if (v < mn) mn = v
        i += 1
      }
      if (seen.add(mn)) out.add(mn)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Winnowing SELECTIONS — distinct "lpad(pos, 8, '0'):hash" strings
    * (rightmost minimum per window, per the MOSS paper), equal to the
    * expression formulation in TextAnalysis.winnowing. The string form
    * sorts canonically by position in any engine, which is what the
    * digest compares.
    */
  def winnowSelect(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    // n = 0: no grams → no selections (see windowMinDistinct note)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nWin = math.max(n - w, 0) + 1
    val seen = new java.util.HashSet[String](nWin * 2)
    val out = new java.util.ArrayList[Any](nWin)
    var j = 0
    while (j < nWin) {
      var mn = Long.MaxValue
      var pos = -1
      var i = j
      val end = math.min(j + w, n)
      while (i < end) {
        val v = arr.getLong(i)
        if (v <= mn) { mn = v; pos = i } // <= keeps the RIGHTMOST tie
        i += 1
      }
      val s = {
        val p = pos.toString
        "0" * math.max(8 - p.length, 0) + p + ":" + mn.toString
      }
      if (seen.add(s)) out.add(UTF8String.fromString(s))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Custom Catalyst expressions for fingerprinting — single-pass, no UDF
  * serialization, and codegen'd (the generated Java calls the static
  * kernel, so the expression stays inside the WholeStageCodegen span
  * instead of forcing a CodegenFallback row-conversion boundary).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Rolling-hash fingerprint expression — see [[HashKernels.rollingHash]]. */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingHash($c)")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

/** One-pass MinHash signature over an array<long> of base hashes —
  * replaces numPerm separate transform+array_min passes (numPerm
  * intermediate arrays per row) with a single kernel loop.
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {
  private val seeds = HashKernels.minhashSeeds(numPerm)

  override def dataType: DataType = ArrayType(LongType)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Word-k-gram hash set of a text column — see
  * [[HashKernels.gramHashes]]. The workhorse front of every
  * shingle-based pipeline (MinHash, LSH, Jaccard verify): the
  * interpreted `transform(..., i -> xxhash64(array_join(slice(...))))`
  * formulation allocated a string per gram per row OUTSIDE
  * whole-stage codegen and dominated those queries' CPU.
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.gramHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

/** Portable word-k-gram md5-mod-2^31 hash set — see
  * [[HashKernels.gramMd5Mod31]].
  */
case class GramMd5Mod31(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.gramMd5Mod31(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.gramMd5Mod31($c, $k)")

  override protected def withNewChildInternal(c: Expression): GramMd5Mod31 =
    copy(child = c)
}

/** One-pass portable MinHash signature — see
  * [[HashKernels.minhashSigPortable]].
  */
case class MinHashSigPortable(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")
  override def dataType: DataType = ArrayType(LongType)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSigPortable(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSigPortable($c, $numPerm)")

  override protected def withNewChildInternal(c: Expression): MinHashSigPortable =
    copy(child = c)
}

/** Positional per-gram rolling hashes — see
  * [[HashKernels.gramRollingHashes]].
  */
case class GramRollingHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.gramRollingHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.gramRollingHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): GramRollingHashes =
    copy(child = c)
}

/** Word-regrouping into fixed-width lines — see
  * [[HashKernels.regroupWords]].
  */
case class RegroupWords(child: Expression, every: Int)
    extends UnaryExpression {
  require(every >= 1, s"line width must be >= 1, got $every")
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    HashKernels.regroupWords(input.asInstanceOf[UTF8String], every)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.regroupWords($c, $every)")

  override protected def withNewChildInternal(c: Expression): RegroupWords =
    copy(child = c)
}

/** Word n-gram strings — see [[HashKernels.gramStrings]]. */
case class GramStrings(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.gramStrings(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.gramStrings($c, $n)")

  override protected def withNewChildInternal(c: Expression): GramStrings =
    copy(child = c)
}

/** Distinct window-min selection — see [[HashKernels.windowMinDistinct]]. */
case class WindowMinDistinct(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.windowMinDistinct(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.windowMinDistinct($c, $w)")

  override protected def withNewChildInternal(c: Expression): WindowMinDistinct =
    copy(child = c)
}

/** Position-tagged winnowing selections — see [[HashKernels.winnowSelect]]. */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.winnowSelect(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.winnowSelect($c, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
}

object Hashes {
  // Spark 4 Columns are Connect-agnostic; the classic bridge converts
  // Column <-> catalyst Expression.
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def rolling_hash(text: Column): Column = column(RollingHash(expression(text)))
  def gram_hashes(text: Column, k: Int): Column =
    column(GramHashes(expression(text), k))
  def gram_strings(text: Column, n: Int): Column =
    column(GramStrings(expression(text), n))
  def regroup_words(text: Column, every: Int): Column =
    column(RegroupWords(expression(text), every))
  def gram_rolling_hashes(text: Column, k: Int): Column =
    column(GramRollingHashes(expression(text), k))
  def window_min_distinct(hashes: Column, w: Int): Column =
    column(WindowMinDistinct(expression(hashes), w))
  def winnow_select(hashes: Column, w: Int): Column =
    column(WinnowSelect(expression(hashes), w))
  def minhash_sig(baseHashes: Column, numPerm: Int): Column =
    column(MinHashSig(expression(baseHashes), numPerm))
  def gram_md5_mod31(text: Column, k: Int): Column =
    column(GramMd5Mod31(expression(text), k))
  def minhash_sig_portable(hashes: Column, numPerm: Int): Column =
    column(MinHashSigPortable(expression(hashes), numPerm))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
