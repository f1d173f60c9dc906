package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309) parsing and retroactive gating — the
  * compliance pass curation pipelines run over an ALREADY-fetched
  * crawl: drop pages the site's current robots policy disallows for
  * your crawler (C4-style opt-out respect; Common Crawl ships the
  * robots captures alongside the pages, so this is corpus data, not
  * a fetch-side concern).
  *
  * Semantics implemented (RFC 9309 + the de-facto Google extensions):
  * group selection by longest user-agent token that case-insensitively
  * prefixes the caller's product token, `*` as fallback, ALL groups at
  * the winning specificity merged; per-path verdict by the
  * longest-pattern matching rule, allow winning ties; `*` wildcard and
  * `$` end-anchor in patterns; empty pattern = no rule; unknown
  * directives (crawl-delay, sitemap) and comments ignored; no robots
  * row / no matching rule → allowed. Percent-encoding normalization is
  * out of scope (patterns and paths compare as stored).
  *
  * Scale shape: [[RobotsKernels.rules]] parses each robots BLOB once
  * per host row (codegen'd kernel, zero shuffle); pages reach their
  * host's compiled rule array through one host-keyed equi-join that
  * AQE broadcasts when the robots snapshot is small (it is
  * host-bounded, the blocklist class — a full-web snapshot degrades to
  * one shuffle of the PAGES keyed by host, the minimum any per-host
  * policy application pays); the per-page verdict is a codegen'd
  * array walk with a process-wide compiled-pattern cache (robots rule
  * patterns are low-cardinality across a crawl).
  */
object RobotsKernels {

  /** rule = (allow, pattern); returned as struct rows. */
  val RuleType: ArrayType = ArrayType(new StructType()
    .add("allow", BooleanType, nullable = false)
    .add("pattern", StringType, nullable = false), containsNull = false)

  /** Parse a robots.txt blob and return the rule list of the group
    * matching `agent` (merged across same-specificity groups),
    * pattern order preserved.
    */
  def rules(robots: UTF8String, agent: UTF8String): ArrayData = {
    val agentLc = agent.toString.toLowerCase
    // groups: (agent tokens, rules); consecutive UA lines share a group
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var lastWasAgent = false
    robots.toString.split("\r?\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!lastWasAgent || groups.isEmpty)
              groups += ((scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty))
            groups.last._1 += value.toLowerCase
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            if (value.nonEmpty && groups.nonEmpty)
              groups.last._2 += ((name == "allow", value))
          case _ => lastWasAgent = false
        }
      } else if (line.nonEmpty) lastWasAgent = false
    }
    // specificity: longest token that prefixes the agent; '*' scores 0
    def score(tokens: Seq[String]): Int = tokens.foldLeft(-1) { (best, t) =>
      if (t == "*") math.max(best, 0)
      else if (agentLc.startsWith(t)) math.max(best, t.length)
      else best
    }
    val scored = groups.map { case (ts, rs) => (score(ts.toSeq), rs) }
    val best = if (scored.isEmpty) -1 else scored.map(_._1).max
    val merged =
      if (best < 0) Seq.empty
      else scored.filter(_._1 == best).flatMap(_._2).toSeq
    new GenericArrayData(merged.map { case (allow, pat) =>
      new GenericInternalRow(Array[Any](allow, UTF8String.fromString(pat)))
    }.toArray[Any])
  }

  /** The `Crawl-delay` (seconds) of the group matching `agent` — the
    * same group-selection walk as [[rules]] (longest prefixing token,
    * `*` fallback, same-specificity groups merged in file order with
    * the LAST declared delay winning — the rule-merge convention
    * applied to a scalar). Crawl-delay is a de-facto extension, not
    * RFC 9309, but real schedulers honor it; unparseable or absent →
    * null (caller supplies the politeness default). Returned boxed so
    * absence is representable.
    */
  def crawlDelay(robots: UTF8String, agent: UTF8String): java.lang.Double = {
    val agentLc = agent.toString.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String], Array[java.lang.Double])]
    var lastWasAgent = false
    robots.toString.split("\r?\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!lastWasAgent || groups.isEmpty)
              groups += ((scala.collection.mutable.ArrayBuffer.empty,
                Array[java.lang.Double](null)))
            groups.last._1 += value.toLowerCase
            lastWasAgent = true
          case "crawl-delay" =>
            lastWasAgent = false
            if (groups.nonEmpty) {
              try { groups.last._2(0) = java.lang.Double.parseDouble(value) }
              catch { case _: NumberFormatException => () }
            }
          case _ => lastWasAgent = false
        }
      } else if (line.nonEmpty) lastWasAgent = false
    }
    def score(tokens: Seq[String]): Int = tokens.foldLeft(-1) { (best, t) =>
      if (t == "*") math.max(best, 0)
      else if (agentLc.startsWith(t)) math.max(best, t.length)
      else best
    }
    val scored = groups.map { case (ts, d) => (score(ts.toSeq), d(0)) }
    val best = if (scored.isEmpty) -1 else scored.map(_._1).max
    if (best < 0) null
    else scored.filter(_._1 == best).map(_._2) // last non-null wins
      .foldLeft(null: java.lang.Double)((acc, d) => if (d != null) d else acc)
  }

  // compiled-pattern cache: robots patterns are low-cardinality across
  // a crawl (the charset-cache pattern)
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def compiled(rulePattern: String): java.util.regex.Pattern =
    patternCache.computeIfAbsent(rulePattern, { p =>
      val endAnchor = p.endsWith("$")
      val body = if (endAnchor) p.dropRight(1) else p
      val rx = body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote)
        .mkString(".*") + (if (endAnchor) "$" else "")
      java.util.regex.Pattern.compile(rx)
    })

  /** Longest-pattern-wins verdict; allow wins equal-length ties; no
    * matching rule → allowed.
    */
  def allowed(rules: ArrayData, path: UTF8String): Boolean = {
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.numElements()) {
      val row = rules.getStruct(i, 2)
      val allow = row.getBoolean(0)
      val pat = row.getString(1).toString
      if (compiled(pat).matcher(p).lookingAt()) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len
          bestAllow = allow
        }
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }
}

/** Codegen'd robots.txt group parse — see [[RobotsKernels.rules]]. */
case class RobotsRules(child: Expression, agent: String)
    extends UnaryExpression {
  override def dataType: DataType = RobotsKernels.RuleType

  private val agentU = UTF8String.fromString(agent)

  override def nullSafeEval(input: Any): Any =
    RobotsKernels.rules(input.asInstanceOf[UTF8String], agentU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("agent", agentU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.ops.RobotsKernels.rules($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): RobotsRules =
    copy(child = c)
}

/** Codegen'd crawl-delay extraction — see [[RobotsKernels.crawlDelay]]. */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val agentU = UTF8String.fromString(agent)

  override def nullSafeEval(input: Any): Any =
    RobotsKernels.crawlDelay(input.asInstanceOf[UTF8String], agentU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("agent", agentU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("delay")
      s"""
        |java.lang.Double $boxed = graft.ops.RobotsKernels.crawlDelay($c, $ref);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.doubleValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): RobotsCrawlDelay =
    copy(child = c)
}

/** Codegen'd per-path robots verdict — see [[RobotsKernels.allowed]]. */
case class RobotsAllowed(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(rules: Any, path: Any): Any =
    RobotsKernels.allowed(rules.asInstanceOf[ArrayData],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, p) => s"graft.ops.RobotsKernels.allowed($r, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object Robots {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Rule list of the group matching `agent` in a robots.txt column. */
  def robots_rules(robotsTxt: Column, agent: String): Column =
    column(RobotsRules(expression(robotsTxt), agent))

  /** Verdict of a rule list against a path (+query) column. */
  def robots_allowed(rules: Column, path: Column): Column =
    column(RobotsAllowed(expression(rules), expression(path)))

  /** `Crawl-delay` seconds for `agent` from a robots.txt column
    * (null when the matched group declares none) — feeds
    * [[graft.pipeline.Crawl.fetchScheduleWithDelay]].
    */
  def crawl_delay(robotsTxt: Column, agent: String): Column =
    column(RobotsCrawlDelay(expression(robotsTxt), agent))

  /** `Sitemap:` directives from a robots.txt blob (standalone lines
    * per RFC 9309 §2.3 / sitemaps.org, case-insensitive, outside any
    * user-agent group) as a URL array — the discovery handoff:
    * robots → [[Sitemaps.parse]] → `Crawl.frontier`. Pure regexp
    * column, zero shuffle.
    */
  def sitemapUrls(robotsTxt: Column): Column =
    regexp_extract_all(robotsTxt,
      lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"), lit(1))

  /** Path + query of a URL, as robots rules match it ("/" when the
    * URL has no path).
    */
  def pathOf(url: Column): Column = {
    val tail = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(tail === "", lit("/")).otherwise(tail)
  }

  /** Annotate a URL-carrying corpus with its per-page robots verdict:
    * `robots` is a (host, robots_txt) snapshot (robots.txt is per
    * HOST, not per registered domain — subdomains carry their own);
    * pages whose host has no row are allowed. Adds `allowed`.
    */
  def robotsVerdict(docs: DataFrame, robots: DataFrame, agent: String,
                    urlCol: String = "url"): DataFrame = {
    val rules = robots.select(col("host").as("__r_host"),
      robots_rules(col("robots_txt"), agent).as("__rules"))
    docs
      .withColumn("__host", UrlOps.hostOf(col(urlCol)))
      .join(rules, col("__host") === col("__r_host"), "left")
      .withColumn("allowed",
        coalesce(robots_allowed(col("__rules"), pathOf(col(urlCol))), lit(true)))
      .drop("__host", "__r_host", "__rules")
  }

  /** Drop pages the robots snapshot disallows for `agent` — the
    * filtering form of [[robotsVerdict]].
    */
  def applyRobots(docs: DataFrame, robots: DataFrame, agent: String,
                  urlCol: String = "url"): DataFrame =
    robotsVerdict(docs, robots, agent, urlCol)
      .filter(col("allowed")).drop("allowed")

  /** Page-level opt-out: true when the page carries
    * `<meta name="robots" content="… noindex …">` (either attribute
    * order, any quoting) — the in-page complement of the robots.txt
    * gate, honored by C4-style opt-out respect. Pure codegen'd regexp,
    * zero shuffle.
    */
  def metaNoindex(html: Column): Column =
    html.rlike("(?is)<meta[^>]*\\bname\\s*=\\s*[\"']?robots\\b[^>]*" +
        "\\bcontent\\s*=\\s*[\"']?[^\"'>]*\\bnoindex") ||
      html.rlike("(?is)<meta[^>]*\\bcontent\\s*=\\s*[\"']?[^\"'>]*\\bnoindex" +
        "[^>]*\\bname\\s*=\\s*[\"']?robots\\b")

  /** Header-level opt-out: true when an HTTP payload's header block
    * carries `X-Robots-Tag: … noindex` — pass the raw payload's
    * string view (headers are ASCII; the body never contains a line
    * matching an anchored header name before the block ends, and a
    * false positive there costs one page, not correctness of the
    * gate).
    */
  def headerNoindex(payloadStr: Column): Column =
    regexp_extract(payloadStr, "(?s)^(HTTP/.*?\r\n\r\n)", 1)
      .rlike("(?im)^x-robots-tag:[^\r\n]*\\bnoindex")
}
