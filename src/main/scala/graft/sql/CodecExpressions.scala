package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** IPv6 / UUID codecs as pure Catalyst expression trees — usable both from
  * the FunctionRegistry (builders must emit resolved-able Expressions, not
  * Column nodes) and from the Column API (graft.functions.CodecFunctions
  * wraps these). Semantics documented in CodecFunctions.
  */
object CodecExpressions {

  /** binary(16) → RFC 5952 canonical IPv6 text. */
  def ipv6NumToString(bin: Expression): Expression = {
    val groups = (0 until 8).map { g =>
      RegExpReplace(Lower(Hex(Substring(bin, Literal(g * 2 + 1), Literal(2)))),
        Literal("^0{1,3}"), Literal(""))
    }
    val full = ConcatWs(Literal(":") +: groups)
    (8 to 2 by -1).foldRight(full: Expression) { (k, acc) =>
      val run = "0" + "(?::0)" * (k - 1)
      If(RLike(full, Literal(s"(?:^|:)$run(?::|$$)")),
        RegExpReplace(full, Literal(s"^(.*?)(?:^|:)$run(?::|$$)(.*)$$"),
          Literal("$1::$2")),
        acc)
    }
  }

  /** IPv6 text (full or '::'-compressed) → binary(16). */
  def ipv6StringToNum(s: Expression): Expression = {
    val t = Lower(s)
    val marked = RegExpReplace(t, Literal("::"), Literal(":z:"))
    val hasGap = Contains(t, Literal("::"))
    val nGroups = Subtract(
      Size(StringSplit(marked, Literal(":"), Literal(-1))),
      If(hasGap, Literal(1), Literal(0)))
    val expanded = (2 to 8).foldLeft(t: Expression) { (acc, missing) =>
      If(And(hasGap, EqualTo(nGroups, Literal(8 - missing))),
        RegExpReplace(t, Literal("::"),
          Literal(":" + Seq.fill(missing)("0").mkString(":") + ":")),
        acc)
    }
    val cleaned = RegExpReplace(RegExpReplace(expanded,
      Literal("^:"), Literal("0:")), Literal(":$"), Literal(":0"))
    val padded = (0 until 8).map { g =>
      StringLPad(ElementAt(StringSplit(cleaned, Literal(":"), Literal(-1)),
        Literal(g + 1)), Literal(4), Literal("0"))
    }
    Unhex(Upper(Concat(padded)))
  }

  /** UUID text → binary(16). */
  def uuidStringToNum(s: Expression): Expression =
    Unhex(Upper(RegExpReplace(s, Literal("-"), Literal(""))))

  /** binary(16) → canonical lowercase dashed UUID text. */
  def uuidNumToString(bin: Expression): Expression = {
    val h = Lower(Hex(bin))
    ConcatWs(Seq(Literal("-"),
      Substring(h, Literal(1), Literal(8)),
      Substring(h, Literal(9), Literal(4)),
      Substring(h, Literal(13), Literal(4)),
      Substring(h, Literal(17), Literal(4)),
      Substring(h, Literal(21), Literal(12))))
  }
}
