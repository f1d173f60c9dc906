package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus gates — the passes a mixed crawl or repository dump
  * runs before routing documents into prose vs code pipelines (The
  * Stack / StarCoder class): LICENSE detection (keep permissive,
  * drop/flag copyleft and unknown) and CODE-vs-PROSE detection
  * (prose gates — langId, sentence quality, stopword ratios — are
  * meaningless over source code, and tokenizer training wants the
  * split explicit).
  *
  * Both are per-row codegen'd regexp/arithmetic columns — zero
  * shuffle, column-prunable — and every pattern is deliberately
  * RE2-compatible (no lookbehind/backrefs), so the verdicts sit on
  * the cross-engine oracle hash path.
  */
object CodeText {

  /** License classes by marker phrases, checked in PRIORITY order —
    * a file can cite several (dual-licensing boilerplate, vendored
    * headers); the strictest class wins so downstream keep-rules stay
    * conservative: copyleft > permissive > public-domain > none.
    * Detection is case-insensitive over SPDX identifiers AND the
    * classic header phrases (real corpora predate SPDX).
    */
  private val copyleft =
    "(?i)(SPDX-License-Identifier:\\s*(GPL|AGPL|LGPL)|GNU (GENERAL|LESSER|AFFERO) PUBLIC LICENSE|GPL-[23]\\.0)"
  private val permissive =
    "(?i)(SPDX-License-Identifier:\\s*(MIT|Apache|BSD|ISC)|Permission is hereby granted, free of charge|Licensed under the Apache License|Redistribution and use in source and binary forms)"
  private val publicDomain =
    "(?i)(SPDX-License-Identifier:\\s*(CC0|Unlicense)|This is free and unencumbered software released into the public domain)"

  /** license class column: copyleft / permissive / public_domain / none. */
  def licenseClass(text: Column): Column =
    when(text.rlike(copyleft), lit("copyleft"))
      .when(text.rlike(permissive), lit("permissive"))
      .when(text.rlike(publicDomain), lit("public_domain"))
      .otherwise(lit("none"))

  /** Per-doc license report: class + the redistribution verdict the
    * keep-rule consumes (permissive and public_domain redistribute).
    */
  def detectLicense(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val cls = licenseClass(col(textCol))
    docs.select(col(idCol), cls.as("license_class"),
      cls.isin("permissive", "public_domain").as("redistributable"))
  }

  /** Code-vs-prose signals + verdict. Signals (all cheap, all
    * cross-engine):
    *  - symbol_ratio: fraction of chars in the code-symbol class
    *    `{}();=<>[]` — prose sits near 0, source hovers 0.05+
    *  - indent_lines: fraction of lines starting with 2+ spaces or a
    *    tab (block structure)
    *  - semicolon_eol: fraction of lines ending in `;` or `{` or `}`
    * Verdict: code iff symbol_ratio >= symbolT OR (indent + eol
    * combined clear their own bars) — a disjunction because Python
    * (no semicolons) and minified JS (no indentation) each defeat one
    * signal.
    */
  def detectCode(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id",
                 symbolT: Double = 0.04, structT: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    val nLines = (length(t) - length(regexp_replace(t, "\n", "")) + 1)
      .cast("double")
    val symbols =
      (length(t) - length(regexp_replace(t, "[{}();=<>\\[\\]]", "")))
        .cast("double")
    val indents = regexp_count(t, lit("(?m)^(  |\\t)")).cast("double")
    val eols = regexp_count(t, lit("(?m)[;{}]$")).cast("double")
    docs.select(col(idCol),
        round(symbols / len, 6).as("symbol_ratio"),
        round(indents / nLines, 6).as("indent_ratio"),
        round(eols / nLines, 6).as("eol_ratio"))
      .withColumn("is_code",
        col("symbol_ratio") >= symbolT ||
          (col("indent_ratio") >= structT && col("eol_ratio") >= structT / 2))
  }
}
