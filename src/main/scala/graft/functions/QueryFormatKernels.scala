package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** formatQuery / formatQuerySingleLine (+OrNull twins) — the
  * reference's SQL formatter functions (src/Functions/formatQuery.cpp:
  * parse the argument with the full SQL parser, render the AST
  * multiline or single-line; the OrNull twins return NULL instead of
  * throwing on a parse error).
  *
  * Spark rendering — a BOUNDED CANONICALIZING PRINTER over the dialect
  * token stream, not an AST re-renderer (Spark has no SQL reverse
  * renderer; a full ClickHouse AST printer would be a transliteration):
  * keywords normalize to UPPERCASE, whitespace/comments collapse to
  * canonical single spacing, string/identifier literals pass through
  * untouched, and the multiline form breaks before top-level clause
  * keywords. Parse-error detection is the tokenizer's own: unterminated
  * string/identifier literals, unbalanced parentheses, an empty
  * statement, or an unknown leading keyword throw (or yield NULL in the
  * OrNull twins). DOCUMENTED DEVIATION: expression-level layout
  * (ClickHouse indents select-list items) is not reproduced — the
  * canonical text, not the pretty layout, is the contract here.
  */
object QueryFormatKernels {

  private val keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "offset", "with", "as", "and", "or", "not", "in", "is", "null",
    "distinct", "union", "all", "intersect", "except", "join", "inner",
    "left", "right", "full", "cross", "outer", "on", "using", "case",
    "when", "then", "else", "end", "between", "like", "ilike", "exists",
    "insert", "into", "values", "create", "table", "view", "drop",
    "alter", "truncate", "describe", "desc", "show", "explain", "set",
    "optimize", "system", "grant", "revoke", "update", "delete",
    "rename", "exchange", "attach", "detach", "kill", "check", "use",
    "watch", "backup", "restore", "prewhere", "qualify", "sample",
    "final", "settings", "format", "interval", "asc", "desc", "nulls",
    "first", "last", "top", "ties", "fill", "interpolate", "totals",
    "rollup", "cube", "grouping", "sets", "array", "any", "asof",
    "semi", "anti", "paste", "global", "if", "engine", "partition",
    "primary", "key", "ttl", "to", "default", "materialized", "alias",
    "codec", "comment", "cluster", "database", "dictionary", "function",
    "exists", "temporary", "or", "replace", "window", "over", "rows",
    "range", "groups", "unbounded", "preceding", "following", "current",
    "row", "cast", "true", "false", "limit", "by")

  private val starters: Set[String] = Set(
    "select", "with", "insert", "create", "alter", "drop", "show",
    "explain", "set", "optimize", "system", "grant", "revoke",
    "truncate", "delete", "update", "describe", "desc", "use", "exists",
    "rename", "exchange", "kill", "check", "detach", "attach", "watch",
    "backup", "restore", "values", "undrop")

  private val breakBefore: Set[String] = Set(
    "from", "where", "prewhere", "group", "having", "order", "limit",
    "settings", "union", "intersect", "except", "qualify", "into",
    "format", "offset", "window")

  private final class ParseError(msg: String)
    extends IllegalArgumentException(msg)

  /** Tokenize: strings ('' and backslash escapes), backtick and
    * double-quoted identifiers, line and block comments (dropped),
    * words, numbers, punctuation. Throws ParseError on unterminated
    * literals. */
  private def tokens(sql: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        if (end < 0) throw new ParseError("unterminated block comment")
        i = end + 2
      } else if (c == '\'' || c == '`' || c == '"') {
        val q = c
        val sb = new StringBuilder().append(q)
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = sql.charAt(i)
          if (d == '\\' && i + 1 < n && q == '\'') {
            sb.append(d).append(sql.charAt(i + 1)); i += 2
          } else if (d == q && i + 1 < n && sql.charAt(i + 1) == q) {
            sb.append(d).append(d); i += 2
          } else if (d == q) { sb.append(d); i += 1; closed = true }
          else { sb.append(d); i += 1 }
        }
        if (!closed) throw new ParseError(s"unterminated $q-literal")
        out += sb.toString
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit ||
          sql.charAt(i) == '_')) i += 1
        out += sql.substring(s, i)
      } else if (c.isDigit) {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit ||
          sql.charAt(i) == '.' || ((sql.charAt(i) == '+' ||
            sql.charAt(i) == '-') && i > s &&
            (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += sql.substring(s, i)
      } else {
        // multi-char operators first
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<=", ">=", "!=", "<>", "||", "::", "->").contains(two)) {
          out += two; i += 2
        } else { out += c.toString; i += 1 }
      }
    }
    out.result()
  }

  private def isWord(t: String): Boolean =
    t.nonEmpty && (t.charAt(0).isLetter || t.charAt(0) == '_')

  /** Keyword-set words that commonly double as COLUMN NAMES — these
    * uppercase only in an unambiguous keyword POSITION (the reference's
    * AST printer preserves identifier spelling: `select key from t`
    * keeps `key` lowercase). Everything else in `keywords` is a clause
    * or operator word that cannot be a bare identifier in valid SQL
    * positionally adjacent to itself, so it keeps the simple rule. */
  private val contextualKw: Set[String] = Set(
    "key", "first", "last", "comment", "database", "row", "rows",
    "range", "groups")

  /** Is the contextual word `w` (lowercase) in keyword position? `prevL`
    * is the previous ORIGINAL token lowercased (null at start), `n1`/`n2`
    * the next two tokens lowercased ("" past the end). */
  private def contextKeyword(w: String, prevL: String, n1: String,
      n2: String): Boolean = w match {
    case "key" => prevL == "primary"
    case "first" | "last" => prevL == "nulls"
    case "row" => prevL == "current"
    case "rows" | "range" | "groups" =>
      // window frame heads: ROWS|RANGE|GROUPS BETWEEN … / UNBOUNDED … /
      // <n> PRECEDING|FOLLOWING
      n1 == "between" || n1 == "unbounded" ||
        (n1.nonEmpty && n1.charAt(0).isDigit &&
          (n2 == "preceding" || n2 == "following"))
    case "comment" => n1.startsWith("'") // COMMENT 'text'
    case "database" => Set("create", "drop", "show", "attach", "detach",
      "exists", "on", "undrop")(prevL)
    case _ => false
  }

  private def render(sql: String, singleLine: Boolean): String = {
    val ts = tokens(sql)
    if (ts.isEmpty) throw new ParseError("empty statement")
    if (!isWord(ts.head) || !starters.contains(ts.head.toLowerCase))
      throw new ParseError(s"cannot parse statement head '${ts.head}'")
    var depth = 0
    val sb = new StringBuilder
    var prev: String = null
    var prevRaw: String = null // original spelling, for context checks
    // two-word clause heads: GROUP BY / ORDER BY keep one line
    ts.zipWithIndex.foreach { case (t0, ti) =>
      val lower = t0.toLowerCase
      val afterDot = prevRaw == "." // qualified ref: always an identifier
      val isKw = isWord(t0) && keywords.contains(lower) && !afterDot &&
        (!contextualKw(lower) || contextKeyword(lower,
          if (prevRaw == null) "" else prevRaw.toLowerCase,
          if (ti + 1 < ts.length) ts(ti + 1).toLowerCase else "",
          if (ti + 2 < ts.length) ts(ti + 2).toLowerCase else ""))
      val t = if (isKw) t0.toUpperCase else t0
      if (t == "(") depth += 1
      if (t == ")") {
        depth -= 1
        if (depth < 0) throw new ParseError("unbalanced )")
      }
      val sep: String =
        if (prev == null) ""
        else if (!singleLine && depth == 0 && isKw &&
          breakBefore.contains(t0.toLowerCase) && prev != "(" &&
          // clause heads that complete the PREVIOUS keyword stay inline
          // (INSERT INTO, GROUP BY's BY is not in breakBefore anyway)
          !(t == "INTO" && prev == "INSERT")) "\n"
        else if (t == "," || t == ";" || t == ")" || t == "::") ""
        else if (prev == "(" || prev == "::") ""
        else if (t == "." || prev == ".") ""
        else if (t == "(" && isWord(prev) &&
          !keywords.contains(prev.toLowerCase)) ""
        else " "
      sb.append(sep).append(t)
      prev = t
      prevRaw = t0
    }
    if (depth != 0) throw new ParseError("unbalanced (")
    sb.toString
  }

  private def run(sql: UTF8String, singleLine: Boolean,
      orNull: Boolean): UTF8String =
    try UTF8String.fromString(render(sql.toString, singleLine))
    catch {
      case e: ParseError =>
        if (orNull) null
        else throw new IllegalArgumentException(
          s"formatQuery: cannot parse the statement (${e.getMessage})")
    }

  def formatQuery(sql: UTF8String): UTF8String =
    run(sql, singleLine = false, orNull = false)
  def formatQueryOrNull(sql: UTF8String): UTF8String =
    run(sql, singleLine = false, orNull = true)
  def formatQuerySingleLine(sql: UTF8String): UTF8String =
    run(sql, singleLine = true, orNull = false)
  def formatQuerySingleLineOrNull(sql: UTF8String): UTF8String =
    run(sql, singleLine = true, orNull = true)
}
