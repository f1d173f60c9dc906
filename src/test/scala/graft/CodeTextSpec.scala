package graft

import org.apache.spark.sql.functions._

import graft.text.CodeText

class CodeTextSpec extends SparkSpec {
  import spark.implicits._

  private def license(s: String): (String, Boolean) =
    CodeText.detectLicense(Seq((1L, s)).toDF("doc_id", "text"))
      .as[(Long, String, Boolean)].head() match { case (_, c, r) => (c, r) }

  test("detectLicense: SPDX and phrase forms, strictest class wins, none") {
    assert(license("// SPDX-License-Identifier: MIT\ncode") == (("permissive", true)))
    assert(license("Permission is hereby granted, free of charge, to any person") ==
      (("permissive", true)))
    assert(license("/* gnu general public license v2 */") == (("copyleft", false)))
    assert(license("# SPDX-License-Identifier: Apache-2.0") == (("permissive", true)))
    assert(license("This is free and unencumbered software released into the public domain") ==
      (("public_domain", true)))
    // dual-cited boilerplate: copyleft outranks permissive
    assert(license("SPDX-License-Identifier: MIT\n... also under the GNU GENERAL PUBLIC LICENSE") ==
      (("copyleft", false)))
    assert(license("just some readme prose") == (("none", false)))
  }

  test("detectCode: symbol-dense, pythonic, and minified all caught; prose is not") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "  let a = 1;\n  let b = f(a);\n  return b;"),        // classic
      (3L, "def f(x):\n  y = x\n  return y\n  # comment\n  pass"), // pythonic
      (4L, "var a=1;var b=2;function f(){return a+b;}"),           // minified
    ).toDF("doc_id", "text")
    val got = CodeText.detectCode(docs)
      .select("doc_id", "is_code").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    // signals are per-row scalars: no shuffle
    val plan = CodeText.detectCode(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
