package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** normalizeQuery / normalizeQueryKeepNames kernels
  * (src/Functions/normalizeQuery.cpp over
  * src/Parsers/queryNormalization.cpp): literals become `?`, lists of
  * comma-separated literals coalesce to `?..`, and — unless keep_names —
  * "complex" identifiers (3+ digits, or very long, and not a function
  * call) become `?` too. The reference walks its SQL lexer's token
  * stream; this kernel reproduces the same rewrite with ordered regex
  * passes (the published rules, not the lexer), which agrees on
  * well-formed SQL and is what the oracled battery pins.
  */
object QueryNormKernels {

  private val strLit = "'(?:[^'\\\\]|\\\\.|'')*'".r
  private val number =
    "(?<![A-Za-z0-9_.])\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?(?![A-Za-z0-9_.])".r
  // identifier with >2 digits (queryNormalization.cpp:69: "complex if it
  // contains ... more than two digits"), or 36+ bytes (UUID-ish), and NOT
  // immediately a function call
  private val complexIdent =
    ("\\b(?:[A-Za-z_](?:[A-Za-z0-9_]*\\d){3}[A-Za-z0-9_]*" +
      "|[A-Za-z_][A-Za-z0-9_]{35,})\\b(?!\\s*\\()").r
  private val literalList = "\\?\\s*(?:,\\s*\\?)+".r

  def normalize(q: String, keepNames: Boolean): String = {
    var s = strLit.replaceAllIn(q, "?")
    s = number.replaceAllIn(s, "?")
    if (!keepNames) s = complexIdent.replaceAllIn(s, "?")
    literalList.replaceAllIn(s, "?..")
  }

  def normalizeQuery(q: UTF8String): UTF8String =
    UTF8String.fromString(normalize(q.toString, keepNames = false))

  def normalizeQueryKeepNames(q: UTF8String): UTF8String =
    UTF8String.fromString(normalize(q.toString, keepNames = true))
}
