package graft

import graft.sql.ClickHouseSql

/** Round-12 sweep #10 contracts: the custom-TLD walk corner-for-corner
  * against hand-traced ExtractFirstSignificantSubdomain::executeCustom
  * behavior (wildcards, exceptions, exclusion-at-wildcard, fallbacks,
  * first/second-level hosts), list registration surfaces, and the
  * formatQuery canonical printer rules. */
class Tail10Spec extends SparkFunSuite {

  private def one(expr: String): String = {
    val r = ClickHouseSql.sql(spark, s"SELECT $expr AS v").collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  graft.functions.TldLists.register("t10", Seq(
    "// comment line", "com.tr", "co.uk",
    "*.kawasaki.jp", "!city.kawasaki.jp", "dev.example"))

  test("custom cut: regular entries match the LONGEST listed suffix") {
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://news.yandex.com.tr/x', 't10')") == "yandex.com.tr")
    // deeper entry beats the shorter walk position
    graft.functions.TldLists.register("t10b", Seq("example", "b.example"))
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://a.x.b.example', 't10b')") == "x.b.example")
  }

  test("custom cut: `*.` wildcard takes one extra label; `!` exception " +
      "suppresses it (executeCustom TLD_ANY/TLD_EXCLUDE)") {
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://a.b.kawasaki.jp', 't10')") == "a.b.kawasaki.jp")
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://x.city.kawasaki.jp', 't10')") == "city.kawasaki.jp")
    // exception host itself: wildcard at the first dot behaves regular
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://city.kawasaki.jp', 't10')") == "city.kawasaki.jp")
  }

  test("custom cut fallbacks: no dots = host itself; no match = " +
      "second-level domain; WithWWW keeps the www label") {
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://localhost/x', 't10')") == "localhost")
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://a.b.example.com/x', 't10')") == "example.com")
    assert(one("cutToFirstSignificantSubdomainCustomWithWWW(" +
      "'https://www.foo/x', 't10')") == "www.foo")
    assert(one("cutToFirstSignificantSubdomainCustom(" +
      "'https://www.foo/x', 't10')") == "foo")
  }

  test("custom fss consults the last-two-label suffix only (the " +
      "reference routes fssCustom through the classic execute walk)") {
    assert(one("firstSignificantSubdomainCustom(" +
      "'https://news.yandex.com.tr/x', 't10')") == "yandex")
    assert(one("firstSignificantSubdomainCustom(" +
      "'https://a.b.example.com/x', 't10')") == "example")
    assert(one("firstSignificantSubdomainCustom(" +
      "'https://example.com/x', 't10')") == "example")
    assert(one("firstSignificantSubdomainCustom(" +
      "'https://localhost/x', 't10')") == "localhost")
  }

  test("unknown TLD list throws the TLD_LIST_NOT_FOUND analog; the " +
      "name must be a constant") {
    val e = intercept[Exception](one(
      "cutToFirstSignificantSubdomainCustom('https://a.b.c', 'no_such')"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("server-state closures: query_id follows SET, " +
      "initialQueryStartTime is the plan-time stamp, " +
      "hasColumnInTable throws on a missing table") {
    ClickHouseSql.sql(spark, "SET query_id = 'tail10_q'")
    try assert(one("query_id()") == "tail10_q")
    finally ClickHouseSql.sql(spark, "SET query_id = ''")
    assert(one("query_id()") == "")
    assert(one("toString(getOSKernelVersion())").nonEmpty)
    val e = intercept[Exception](one(
      "hasColumnInTable('default', 'no_such_table_t10', 'x')"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("zeros()/zeros_mt() table functions: n rows of the zero column") {
    val r = ClickHouseSql.sql(spark,
      "SELECT count() AS n, sum(zero) AS s FROM zeros(1000)").collect().head
    assert(r.getLong(0) == 1000L && r.getLong(1) == 0L)
    assert(ClickHouseSql.sql(spark,
      "SELECT count() AS n FROM zeros_mt(64)").collect().head.getLong(0) == 64L)
  }

  test("remote() resolves only THIS host; any other address is a loud " +
      "error, never a silent local read") {
    val e = intercept[Exception](ClickHouseSql.sql(spark,
      "SELECT count() AS n FROM remote('otherhost:9000', some.table)")
      .collect())
    assert(e.getMessage.contains("single-node"))
  }

  test("getMacro reads the `macros` named collection; missing macro " +
      "throws the NO_ELEMENTS_IN_CONFIG analog") {
    ClickHouseSql.sql(spark, "DROP NAMED COLLECTION IF EXISTS macros")
    ClickHouseSql.sql(spark,
      "CREATE NAMED COLLECTION macros AS shard = 's1', replica = 'r7'")
    try {
      assert(one("getMacro('replica')") == "r7")
      val e = intercept[Exception](one("getMacro('nope')"))
      assert(e.getMessage.contains("No macro"))
    } finally ClickHouseSql.sql(spark,
      "DROP NAMED COLLECTION IF EXISTS macros")
  }

  test("multiFuzzyMatch literal lane: Sellers substring-within-k " +
      "corners; regex patterns reject at plan time") {
    // substitution / deletion / insertion, each at the k boundary
    assert(one("toString(multiFuzzyMatchAny('banana', 1, array('banXna')))")
      == "true")
    assert(one("toString(multiFuzzyMatchAny('banana', 1, array('bnna')))")
      == "true") // 'bnna' vs 'bnan'? — vs substring 'anana': del
    assert(one("toString(multiFuzzyMatchAny('banana', 0, array('banXna')))")
      == "false")
    assert(one("toString(multiFuzzyMatchAny('xy', 2, array('ab')))")
      == "true") // k >= m always fits
    assert(one("toString(multiFuzzyMatchAnyIndex('abc', 1, array('zzzz')))")
      == "0")
    val e = intercept[Exception](one(
      "toString(multiFuzzyMatchAny('x', 1, array('a.*b')))"))
    assert(e.getMessage.contains("Hyperscan"))
  }

  test("geobase lanes: named-collection registration, garbage-row " +
      "skip, named geobase variants, unknown geobase throws") {
    ClickHouseSql.sql(spark,
      "DROP NAMED COLLECTION IF EXISTS regions_hierarchy_t10")
    // the collection carries the reference's file format (escaped \n
    // separators; tabs between the columns)
    ClickHouseSql.sql(spark,
      "CREATE NAMED COLLECTION regions_hierarchy_t10 AS lines = " +
        "'7\t0\t1\\n8\t7\t3\t500\\n9\t8\t6\\n-4\t0\t3'")
    try {
      def one(expr: String): String = {
        val r = ClickHouseSql.sql(spark, s"SELECT $expr AS v").collect().head
        String.valueOf(r.get(0))
      }
      assert(one("regionToCountry(9, 't10')") == "8")
      assert(one("regionToContinent(9, 't10')") == "7")
      assert(one("regionToPopulation(8, 't10')") == "500")
      assert(one("regionIn(9, 7, 't10')") == "true")
      // the garbage row (-4) is skipped, not an error; unknown ids = 0
      assert(one("regionToCountry(4, 't10')") == "0")
      val e = intercept[Exception](one("regionToCity(1, 'no_such_base')"))
      assert(e.getMessage.contains("not registered"))
    } finally ClickHouseSql.sql(spark,
      "DROP NAMED COLLECTION IF EXISTS regions_hierarchy_t10")
  }

  test("estimateCompressionRatio: NONE is exactly 1.0, real codecs " +
      "compress repetitive text far better than high-entropy bytes") {
    val r = ClickHouseSql.sql(spark, """
      SELECT
        CAST(estimateCompressionRatio('NONE')(rep) AS DOUBLE) AS none,
        CAST(estimateCompressionRatio('LZ4')(rep) AS DOUBLE) AS lz4_rep,
        CAST(estimateCompressionRatio('ZSTD')(rep) AS DOUBLE) AS zstd_rep,
        CAST(estimateCompressionRatio('LZ4')(rnd) AS DOUBLE) AS lz4_rnd
      FROM (
        SELECT repeat('abcdef', 300) AS rep,
               toString(sipHash64(toString(number))) AS rnd
        FROM numbers(50))""").collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) > 5.0 && r.getDouble(2) > 5.0)
    assert(r.getDouble(1) > r.getDouble(3),
      "repetitive text must compress better than hash text")
    val e = intercept[Exception](one(
      "estimateCompressionRatio('BROTLI')(1)"))
    assert(e.getMessage.toLowerCase.contains("unknown codec"))
  }

  test("formatQuery: canonical case/spacing, clause breaks at depth 0 " +
      "only, OrNull twins return NULL on tokenizer errors") {
    assert(one("formatQuery('select a,b from t where x=1')") ==
      "SELECT a, b\nFROM t\nWHERE x = 1")
    assert(one("formatQuerySingleLine(" +
      "'select sum( x ) from (select 1 from u) as q')") ==
      "SELECT sum(x) FROM (SELECT 1 FROM u) AS q")
    assert(one("formatQueryOrNull('select (1')") == null)
    assert(one("formatQueryOrNull('notsql 1')") == null)
    assert(one("formatQuerySingleLineOrNull('select `x')") == null)
    val e = intercept[Exception](one("formatQuery('select (1')"))
    assert(e.getMessage.toLowerCase.contains("cannot parse"))
  }

  test("formatQuery preserves identifiers that collide with keyword " +
      "spellings (key/first/last/row/comment/database) while still " +
      "uppercasing them in true keyword position") {
    // identifier positions stay as written (reference AST printer
    // preserves identifier spelling — round-12 ADVICE)
    assert(one("formatQuerySingleLine('select key from t')") ==
      "SELECT key FROM t")
    assert(one("formatQuerySingleLine(" +
      "'select first, last, row, comment from t')") ==
      "SELECT first, last, row, comment FROM t")
    assert(one("formatQuerySingleLine('select t.select from t')") ==
      "SELECT t.select FROM t")
    assert(one("formatQuerySingleLine('select database from hosts')") ==
      "SELECT database FROM hosts")
    // keyword positions still canonicalize
    assert(one("formatQuerySingleLine(" +
      "'select a from t order by a nulls first')") ==
      "SELECT a FROM t ORDER BY a NULLS FIRST")
    // (t( with no space: the canonical printer treats any non-keyword
    // word before '(' as a call/def head — pre-existing spacing rule)
    assert(one("formatQuerySingleLine(" +
      "'create table t (k int, primary key (k))')") ==
      "CREATE TABLE t(k int, PRIMARY KEY (k))")
    assert(one("formatQuerySingleLine('select sum(x) over (order by d " +
      "rows between 1 preceding and current row) from t')") ==
      "SELECT sum(x) OVER (ORDER BY d ROWS BETWEEN 1 PRECEDING AND " +
        "CURRENT ROW) FROM t")
  }
}
