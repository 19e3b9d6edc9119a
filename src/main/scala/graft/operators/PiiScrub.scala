package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: regex-class redaction of
  * emails, phone numbers, IPv4 addresses, SSNs, and card-shaped number
  * runs, following the regex-tagger design of the published
  * BigScience/Dolma PII pipelines (regex classes for email/phone/IP
  * with typed replacement tokens). Reference-side analog: the engine's
  * string/regexp function family (replaceRegexpAll) composed per class.
  *
  * 100 TB design: pure per-row codegen'd `regexp_replace` /
  * `regexp_count` chains — no shuffle, no UDF, no driver state; the
  * scrub rides the scan.
  *
  * Patterns are deliberately conservative (anchored with word
  * boundaries, bounded repetition) and kept in the RE2-compatible
  * subset so the DuckDB oracle can state the SAME regex. */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re =
    "\\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}" +
      "(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** 4x4 card-shaped digit runs with a uniform separator. */
  val CardRe = "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b"
  /** Separator-delimited phone shapes: optional +country, then
    * 3-3-4 groups with -, ., or space separators (parens optional).
    * The word boundary sits INSIDE the bare-digit alternative — a
    * leading `\b` before `(` or `+` can never match (both are
    * non-word characters), and RE2 has no lookbehind to express it. */
  val PhoneRe =
    "(?:\\+[0-9]{1,3}[-. ])?(?:\\([0-9]{3}\\)|\\b[0-9]{3})[-. ]" +
      "[0-9]{3}[-. ][0-9]{4}\\b"

  /** Redaction classes in application order — card/SSN/phone run before
    * IP so digit-run classes never leave partial matches behind. */
  val classes: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("card", CardRe, "<CARD>"),
    ("ssn", SsnRe, "<SSN>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ip", Ipv4Re, "<IP>"))

  /** The scrubbed text: every class replaced by its typed token. */
  def scrub(text: Column): Column =
    classes.foldLeft(text) { case (c, (_, re, token)) =>
      regexp_replace(c, re, token)
    }

  /** Per-class match counts BEFORE scrubbing (tagger output) — one
    * column per class, named `pii_<class>`. */
  def counts(text: Column): Seq[Column] =
    classes.map { case (name, re, _) =>
      regexp_count(text, lit(re)).as(s"pii_$name")
    }

  /** Total PII matches across classes (counted on the progressively
    * scrubbed text, like the replacement pass itself, so overlapping
    * classes are not double-counted). */
  def totalCount(text: Column): Column =
    classes.foldLeft((lit(0L), text)) {
      case ((acc, c), (_, re, token)) =>
        (acc + regexp_count(c, lit(re)),
          regexp_replace(c, re, token))
    }._1.as("pii_total")
}
