package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization, registered-domain extraction, and domain
  * blocklist filtering — the provenance operators between a crawl
  * ([[graft.sources.Warc]]) and the source-keyed stages this repo
  * already ships (domainMix, shardReport key on a `source` column;
  * UT1-style domain blocklists are the standard companion to the
  * content blocklist in [[BloomPrune]]).
  *
  * Everything here is pure per-row codegen'd string/array
  * expressions — zero shuffle, no UDF, total on malformed input (a
  * string that doesn't parse as a URL canonicalizes by the same rules
  * as far as they apply and yields an empty host). Deliberately
  * regex-based, not java.net.URI: URI.create throws on the malformed
  * URLs a real crawl is full of, and an exception per bad row is the
  * wrong failure mode at 100 TB.
  */
/** Percent-encoding normalization kernel (RFC 3986 §6.2.2): `%58`-class
  * escapes of UNRESERVED characters (ALPHA / DIGIT / `-._~`) decode —
  * `%41` and `A` are the same URI and must canonicalize together or
  * dedupByUrl treats them as distinct pages — while escapes of
  * reserved/other octets keep their `%XX` with the hex UPPERCASED
  * (`%2f` ≡ `%2F`); a `%` not followed by two hex digits passes
  * through literally (crawl-grade totality).
  */
object UrlKernels {
  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def unreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  def normalizePercent(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('%') < 0) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val v = hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2))
        if (unreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd percent-encoding normalization — see
  * [[UrlKernels.normalizePercent]].
  */
case class NormalizePercent(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UrlKernels.normalizePercent(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.UrlKernels.normalizePercent($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NormalizePercent =
    copy(c)
}

object UrlOps {

  /** Query params that carry tracking state, not content identity
    * (the usual canonicalization drop-set: utm campaign tags, click
    * ids, twitter's ref_src). Bare `ref` is deliberately NOT here: on
    * real sites it is often content-bearing (referenced-id endpoints,
    * pagination anchors), and a keep-newest dedupByUrl over a healed
    * `ref` would silently collapse genuinely distinct pages. Callers
    * whose corpus uses `ref` purely for referral tracking pass their
    * own set via [[canonicalizeUrl(url:*,trackingParams:*)]].
    */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_[^=&]*", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref_src")

  /** Multi-part public-suffix second levels: `a.co.uk` registers at 3
    * labels, `a.example.com` at 2. A fixed heuristic set, NOT the full
    * Mozilla public-suffix list (that list is refreshed data, not
    * code; a deployment would broadcast-join its current snapshot —
    * the extraction shape is identical).
    */
  private val MultiPartSld = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Canonical form: lowercase scheme and host, `www.` prefix
    * stripped, default ports dropped (http:80 / https:443), fragment
    * removed, tracking params removed (query otherwise preserved in
    * order), path case preserved. Total: rows without a scheme://host
    * shape pass through the fragment/param rules with the rest
    * untouched.
    */
  /** Percent-encoding normalization (RFC 3986 §6.2.2) — see
    * [[UrlKernels.normalizePercent]]. Compose BEFORE
    * [[canonicalizeUrl]]: `%41` vs `A` and `%2f` vs `%2F` variants of
    * one page must land on one canonical url or keep-newest dedup
    * keeps both.
    */
  def normalizePercentEncoding(url: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      NormalizePercent(
        org.apache.spark.sql.graftbridge.Bridge.expression(url)))

  def canonicalizeUrl(url: Column): Column =
    canonicalizeUrl(url, DefaultTrackingParams)

  /** [[canonicalizeUrl(url:*)]] with a caller-supplied tracking-param
    * drop-set (each element a regex alternative matched against the
    * full param NAME).
    */
  def canonicalizeUrl(url: Column, trackingParams: Seq[String]): Column = {
    require(trackingParams.nonEmpty, "trackingParams must be non-empty")
    val tracking = trackingParams.mkString("|")
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    val bare = regexp_replace(hostPort, "^www\\.", "")
    // default-port strip is SCHEME-AWARE: http://h:443 is a real
    // non-default endpoint and must keep its port (caught by the
    // java.net.URI cross-check in the spec)
    val host = when(scheme === "http", regexp_replace(bare, ":80$", ""))
      .when(scheme === "https", regexp_replace(bare, ":443$", ""))
      .otherwise(bare)
    // split rest into path ? query, drop tracking params from the
    // query (one replace pass: a leading match consumes nothing of the
    // separator, an inner match consumes its leading &), re-attach the
    // query only if something survived
    def dropTracking(q: Column): Column = regexp_replace(
      regexp_replace(q, s"(^|&)(?:$tracking)=[^&]*", "$1"),
      "^&+|&+$|&(?=&)", "")
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = dropTracking(regexp_extract(rest, "\\?(.*)$", 1))
    val tail = concat(path, when(query === "", lit(""))
      .otherwise(concat(lit("?"), query)))
    when(host === "",
      // no scheme://host shape: best-effort — fragment and tracking
      // params still go, the rest passes through untouched
      concat(regexp_extract(noFrag, "^([^?]*)", 1),
        when(dropTracking(regexp_extract(noFrag, "\\?(.*)$", 1)) === "", lit(""))
          .otherwise(concat(lit("?"),
            dropTracking(regexp_extract(noFrag, "\\?(.*)$", 1))))))
      .otherwise(concat(scheme, lit("://"), host, tail))
  }

  /** Host of a canonical (or raw) URL: lowercase, no www., no port. */
  def hostOf(url: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", ""), ":[0-9]+$", "")

  /** Registered domain of a host: the public suffix plus one label —
    * `a.b.example.com` -> `example.com`, `news.bbc.co.uk` ->
    * `bbc.co.uk` (3 labels when the second-to-last label is a known
    * multi-part second level and there are labels to spare). Hosts
    * with fewer than 2 labels (localhost, IPs are out of scope) pass
    * through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val take3 = n >= lit(3) &&
      sld.isin(MultiPartSld: _*) && length(element_at(labels, -1)) <= 3
    when(n <= 2, host)
      .when(take3, concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
  }

  /** Registered domains with the public-suffix list AS DATA — the
    * deployment-grade path [[registeredDomain]]'s fixed heuristic
    * stands in for. `psl` is one `suffix` column holding a snapshot
    * of plain public-suffix rules (`com`, `co.uk`, `github.io`,
    * `de.com` …): the registered domain is the LONGEST listed suffix
    * of the host plus one more label. Hosts matching no rule fall
    * back to the PSL's implicit `*` default (last label is the
    * suffix → 2-label domain); hosts with no label to spare (the
    * host IS a suffix, or a single label) pass through unchanged —
    * the [[registeredDomain]] conventions, now driven by data.
    * Wildcard rules (`*.ck` — any ONE label matches the starred
    * position) and exception rules (`!www.ck` — the matching domain
    * IS registrable even though a wildcard covers it) are honored
    * with PSL priority: a matching exception beats everything and
    * makes the host's matching labels the registered domain;
    * otherwise the longest plain-or-wildcard match wins.
    *
    * Scale shape: one broadcast hash join per candidate suffix
    * length PER RULE CLASS (`maxSuffixLabels`, default 4 — the
    * longest plain rules in the live PSL; wildcard/exception joins
    * start at 2 labels) — the corpus NEVER shuffles and no explode
    * multiplies it; the PSL snapshot is a few hundred KB, exactly
    * the blocklist's broadcast class.
    */
  def registeredDomainWithPsl(docs: DataFrame, psl: DataFrame,
                              hostCol: String = "host",
                              out: String = "domain",
                              maxSuffixLabels: Int = 4): DataFrame = {
    require(maxSuffixLabels >= 1, s"maxSuffixLabels >= 1: $maxSuffixLabels")
    val labels = "__psl_labels"
    val rules = psl.select(col("suffix")).distinct()
    val ruleLen = size(split(col("suffix"), "\\."))
    val plain = rules.filter(!col("suffix").startsWith("!") &&
      !col("suffix").startsWith("*."))
    val wild = rules.filter(col("suffix").startsWith("*."))
    val exc = rules.filter(col("suffix").startsWith("!"))
      .select(col("suffix").substr(lit(2), lit(Int.MaxValue)).as("suffix"))
    var cur = docs.withColumn(labels, split(col(hostCol), "\\."))
    (1 to maxSuffixLabels).foreach { k =>
      // plain: equi-join on the host's k-label suffix; n > k keeps one
      // label to spare (a host that IS a public suffix has no
      // registrable domain and falls through)
      cur = cur.join(
        broadcast(plain.filter(ruleLen === k)
          .select(col("suffix").as(s"__psl_m$k"))),
        concat_ws(".", slice(col(labels), -k, k)) === col(s"__psl_m$k") &&
          size(col(labels)) > k,
        "left")
      if (k >= 2) {
        // wildcard: the host's k-label suffix with its FIRST label
        // replaced by '*' equi-joins the rule text verbatim
        cur = cur.join(
          broadcast(wild.filter(ruleLen === k)
            .select(col("suffix").as(s"__psl_w$k"))),
          concat(lit("*."),
            concat_ws(".", slice(col(labels), -(k - 1), k - 1))) ===
            col(s"__psl_w$k") && size(col(labels)) > k,
          "left")
        // exception: exact k-label suffix match, and >= (not >) — the
        // host may BE the exception domain (www.ck registers itself)
        cur = cur.join(
          broadcast(exc.filter(ruleLen === k)
            .select(col("suffix").as(s"__psl_e$k"))),
          concat_ws(".", slice(col(labels), -k, k)) === col(s"__psl_e$k") &&
            size(col(labels)) >= k,
          "left")
      }
    }
    // fold 1..max so the LONGEST suffix ends outermost in the
    // when-chain (the last fold iteration wraps the rest); a wildcard
    // match at key length k is a k-label suffix like a plain match
    val byLongest = (1 to maxSuffixLabels).foldLeft(
      // no rule matched: implicit `*` default — 2 labels when there
      // are at least 2, else the host unchanged
      when(size(col(labels)) <= 2, col(hostCol))
        .otherwise(concat_ws(".", slice(col(labels), -2, 2)))) {
      case (fallback, k) =>
        val matched =
          if (k >= 2) col(s"__psl_m$k").isNotNull || col(s"__psl_w$k").isNotNull
          else col(s"__psl_m$k").isNotNull
        when(matched,
          concat_ws(".", slice(col(labels), -(k + 1), k + 1))).otherwise(fallback)
    }
    // exceptions wrap outermost — PSL priority: a matching exception
    // beats any plain/wildcard rule, and the host's matching k labels
    // ARE the registered domain
    val withExc = (2 to maxSuffixLabels).foldLeft(byLongest) {
      case (fallback, k) =>
        when(col(s"__psl_e$k").isNotNull,
          concat_ws(".", slice(col(labels), -k, k))).otherwise(fallback)
    }
    cur.withColumn(out, withExc)
      .drop(labels +: ((1 to maxSuffixLabels).map(k => s"__psl_m$k") ++
        (2 to maxSuffixLabels).flatMap(k =>
          Seq(s"__psl_w$k", s"__psl_e$k"))): _*)
  }

  /** Canonicalize + annotate + blocklist-filter a URL-carrying frame:
    * drops rows whose registered domain appears in `blockedDomains`
    * (one `domain` column — UT1 category lists are exactly this
    * shape), returns the survivors with `url` rewritten canonical and
    * a `domain` column for downstream mixing/sharding.
    *
    * Scale shape: the blocklist joins as a broadcast anti-join
    * (UT1-class lists are a few MB); for larger lists the same
    * [[BloomPrune]] two-phase pattern applies upstream. The corpus
    * never shuffles.
    *
    * `psl` (optional): a public-suffix snapshot
    * ([[registeredDomainWithPsl]]'s one-`suffix`-column shape) makes
    * the gate key PSL-EXACT — `a.github.io` and `b.github.io` stop
    * collapsing into one blockable "github.io" domain, `bbc.co.uk`
    * resolves by rule instead of heuristic. Same broadcast class (the
    * PSL is a few hundred KB); the corpus still never shuffles.
    */
  def urlFilter(docs: DataFrame, blockedDomains: DataFrame,
                urlCol: String = "url",
                psl: Option[DataFrame] = None): DataFrame = {
    val canon = docs.withColumn(urlCol, canonicalizeUrl(col(urlCol)))
    val annotated = psl match {
      case Some(p) => registeredDomainWithPsl(
          canon.withColumn("__rd_host", hostOf(col(urlCol))), p,
          hostCol = "__rd_host", out = "domain")
        .drop("__rd_host")
      case None =>
        canon.withColumn("domain", registeredDomain(hostOf(col(urlCol))))
    }
    annotated.join(broadcast(blockedDomains.select(col("domain")).distinct()),
      Seq("domain"), "left_anti")
  }

  /** Crawl re-fetch dedup: a re-crawled corpus carries the same page
    * many times under cosmetically different URLs (tracking params,
    * www/case/port noise) and fetch times — keep ONE row per
    * CANONICAL url: highest `scoreCol` (fetch timestamp for
    * keep-newest, text length for keep-richest), ties by `tieCol`
    * ascending. Emits the canonical `url` and `n_fetches` (how many
    * raw rows collapsed) alongside the surviving row's columns.
    *
    * One exchange keyed by the canonical url — the same shuffle any
    * per-url reduction pays. (`n_fetches` deliberately rides the same
    * window: computing it blocks WindowGroupLimit's pre-shuffle
    * row_number pruning, but the alternative is a second exchange for
    * a count join — one full-width shuffle beats two.)
    */
  def dedupByUrl(docs: DataFrame, scoreCol: String, tieCol: String,
                 urlCol: String = "url"): DataFrame = {
    val canon = docs.withColumn(urlCol, canonicalizeUrl(col(urlCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol))
    val ordered = w.orderBy(col(scoreCol).desc, col(tieCol).asc)
    canon
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("n_fetches", count(lit(1)).over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-registered-domain corpus stats over a URL-carrying frame —
    * the provenance profile that feeds domain mixing and shard
    * reports: doc count and character volume per domain. One
    * partial-agg shuffle keyed by domain.
    */
  def domainStats(docs: DataFrame, urlCol: String = "url",
                  textCol: String = "text"): DataFrame =
    docs.select(registeredDomain(hostOf(col(urlCol))).as("domain"),
        length(col(textCol)).cast("long").as("__chars"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__chars").as("n_chars"))
      .orderBy("domain")
}
