package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-parse rewriter for ClickHouse SQL-isms (SURVEY §7 item 2) — the
  * Spark analog of the reference's parser-level clauses
  * (src/Parsers/ASTSelectQuery.h:18-39: PREWHERE, LIMIT BY, FINAL, FORMAT).
  *
  * Token-level and conservative: SQL with none of the CH-isms passes
  * through untouched; each rewrite maps a CH clause onto the standard
  * relational form Catalyst already optimizes.
  */
object ClickHouseSql {

  /** FINAL-able table registry: table → (keys, version columns), the
    * metadata a ReplacingMergeTree DDL would carry (ORDER BY = keys,
    * `ver` parameter = version). */
  private val replacingTables =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[String], Seq[String])]

  def registerReplacingTable(name: String, keys: Seq[String], version: Seq[String]): Unit =
    replacingTables.put(name.toLowerCase, (keys, version))

  /** Apply all textual rewrites. */
  def rewrite(sql: String): String = {
    var s = sql
    s = rewriteFormat(s)
    s = rewritePrewhere(s)
    s = rewriteFinal(s)
    s = rewriteLimitBy(s)
    s
  }

  /** `... FORMAT JSONEachRow` → strip (output format is the caller's
    * concern in a DataFrame engine). */
  private def rewriteFormat(s: String): String =
    s.replaceAll("(?is)\\bFORMAT\\s+[A-Za-z][A-Za-z0-9]*\\s*;?\\s*$", "")

  /** PREWHERE cond → merged into WHERE. The reference evaluates PREWHERE
    * before reading remaining columns (MergeTreeWhereOptimizer); Spark's
    * parquet predicate pushdown gives the same effect, so semantically the
    * clause is just a conjunct. */
  private def rewritePrewhere(s: String): String = {
    val pre = "(?is)\\bPREWHERE\\b(.*?)(\\bWHERE\\b|\\bGROUP\\s+BY\\b|\\bORDER\\s+BY\\b|\\bLIMIT\\b|$)".r
    pre.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val cond = m.group(1).trim
        val follows = m.group(2)
        if (follows.equalsIgnoreCase("where"))
          s.substring(0, m.start) + s"WHERE ($cond) AND " + s.substring(m.end)
        else
          s.substring(0, m.start) + s"WHERE ($cond) " + follows +
            s.substring(m.end)
    }
  }

  /** `FROM t FINAL` → latest-version-per-key subselect for tables
    * registered as Replacing (reference: FINAL read mode of
    * ReadFromMergeTree). */
  private def rewriteFinal(s: String): String = {
    val fin = "(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FINAL\\b".r
    fin.replaceAllIn(s, m => {
      val t = m.group(1)
      replacingTables.get(t.toLowerCase) match {
        case Some((keys, ver)) =>
          val part = keys.mkString(", ")
          val ord = ver.map(v => s"$v DESC").mkString(", ")
          s"FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY $part ORDER BY $ord) AS __ver_rn FROM $t) WHERE __ver_rn = 1) $t"
        case None => s"FROM $t"
      }
    })
  }

  /** `[ORDER BY o] LIMIT n BY k1, k2` → per-key row_number filter
    * (reference: LimitByTransform). ClickHouse clause order puts LIMIT BY
    * after ORDER BY; the query's ORDER BY defines the per-key pick order
    * (the keys themselves if absent). Supported form: the LIMIT BY clause
    * terminates the query. */
  private def rewriteLimitBy(s: String): String = {
    val lim = "(?is)\\bLIMIT\\s+(\\d+)\\s+BY\\s+([A-Za-z_][A-Za-z0-9_,\\s]*?)\\s*;?\\s*$".r
    lim.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val n = m.group(1)
        val keys = m.group(2).trim.stripSuffix(",")
        var inner = s.substring(0, m.start)
        // pull a trailing ORDER BY out of the inner query to drive the window
        val ob = "(?is)\\bORDER\\s+BY\\s+([^()]*?)\\s*$".r
        val (core, order) = ob.findFirstMatchIn(inner) match {
          case Some(o) => (inner.substring(0, o.start), o.group(1).trim)
          case None => (inner, keys)
        }
        s"SELECT * EXCEPT (__lb_rn) FROM (SELECT *, " +
          s"row_number() OVER (PARTITION BY $keys ORDER BY $order) AS __lb_rn " +
          s"FROM ($core)) WHERE __lb_rn <= $n ORDER BY $keys, $order"
    }
  }

  /** Run CH-dialect SQL: rewrite, then Spark SQL with the alias registry
    * installed. */
  def sql(spark: SparkSession, chSql: String): DataFrame = {
    ChFunctionRegistry.install(spark)
    spark.sql(rewrite(chSql))
  }
}
