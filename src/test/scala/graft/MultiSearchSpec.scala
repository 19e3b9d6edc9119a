package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MultiSearchAnyAC

/** The Aho-Corasick multiSearchAny must be value-identical to the
  * OR-of-contains chain it replaces — including overlapping needles,
  * needles that are prefixes/suffixes of each other (fail-link paths),
  * multi-byte UTF-8, and the empty-needle contains("") == true edge. */
class MultiSearchSpec extends SparkFunSuite {

  private def ac(c: Column, needles: Seq[String]): Column =
    org.apache.spark.sql.graft.ExprColumn.column(
      MultiSearchAnyAC(org.apache.spark.sql.graft.ExprColumn.expression(c), needles))

  test("AC matches the OR-of-contains chain on adversarial needle sets") {
    val s = spark
    import s.implicits._
    val needles = Seq("aba", "ab", "babab", "x", "caba", "ßü", "aa")
    val rows = Seq("ababab", "bbbb", "cabab", "ßü", "ßu", "aAa", "", "aa",
      "zzzcabazz", "babab", "ba", "xyz", "ababababab", "aabbaa")
    val df = rows.toDF("t")
    val orChain = needles.map(n => col("t").contains(n)).reduce(_ || _)
    val got = df.select(col("t"), ac(col("t"), needles).as("ac"),
      orChain.as("or")).collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"AC != OR-chain for input '${r.getString(0)}'")
    }
  }

  test("empty needle matches everything; empty needle set matches nothing") {
    val s = spark
    import s.implicits._
    val df = Seq("abc", "").toDF("t")
    val withEmpty = df.select(ac(col("t"), Seq("zz", "")).as("m")).collect()
    assert(withEmpty.forall(_.getBoolean(0)), "empty needle must match all")
    val noNeedles = df.select(ac(col("t"), Seq.empty).as("m")).collect()
    assert(noNeedles.forall(!_.getBoolean(0)), "empty set must match none")
  }

  test("dialect multiSearchAny with >= 4 literal needles plans the automaton") {
    Tables.register(spark, sf)
    val plan = graft.sql.ClickHouseSql.sql(spark,
      "SELECT multiSearchAny(p_name, array('red','blue','green','ivory')) FROM part")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_multi_search_any"),
      s"expected the AC expression in the plan, got: $plan")
  }

  test("dialect multiSearchAny below 4 needles keeps the pushdown-friendly OR-chain") {
    Tables.register(spark, sf)
    val plan = graft.sql.ClickHouseSql.sql(spark,
      "SELECT multiSearchAny(p_name, array('red','blue')) FROM part")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Contains") && !plan.contains("graft_multi_search_any"))
  }
}
