package graft

import graft.sql.ClickHouseSql

/** Executability smoke over realistic reference-dialect query shapes — the
  * "a user of the reference could paste their query" claim, exercised
  * end-to-end (rewrite + registry + Catalyst + execution). Correctness of
  * the individual pieces is oracled elsewhere (FunctionTail, DialectQueries);
  * this suite pins that the COMBINATIONS keep executing. */
class DialectTortureSpec extends SparkFunSuite {

  private def run(q: String): Long = {
    Tables.register(spark, sf)
    ClickHouseSql.sql(spark, q).collect().length.toLong
  }

  test("analytics shapes execute") {
    assert(run("""
      SELECT toStartOfMonth(o_orderdate) AS m, count() AS n,
        quantile(0.9)(o_totalprice) AS p90,
        countIf(o_orderstatus = 'F') AS done
      FROM orders
      PREWHERE o_totalprice > 1000
      GROUP BY m HAVING count() > 0
      ORDER BY m
      LIMIT 100""") > 0)
    assert(run("""
      SELECT o_orderpriority, sumIf(o_totalprice, o_orderstatus = 'F') AS s
      FROM orders GROUP BY o_orderpriority
      ORDER BY s DESC LIMIT 3""") == 3)
    assert(run("""
      SELECT user_id, event_id FROM events
      ORDER BY event_id LIMIT 2 BY user_id""") > 0)
  }

  test("array and lambda shapes execute") {
    assert(run("""
      SELECT doc_id, w
      FROM documents
      ARRAY JOIN splitByWhitespace(text) AS w
      WHERE length(w) > 3
      LIMIT 50""") > 0)
    assert(run("""
      SELECT arrayFilter(x -> x % 2 = 0,
        arrayMap(x -> x * 3, range(1, 10))) AS evens""") == 1)
    assert(run("""
      SELECT number, arraySum(arrayMap(x -> x * x, range(toInt32(number)))) AS s
      FROM numbers(5) ORDER BY number""") == 5)
  }

  test("string and URL shapes execute") {
    assert(run("""
      SELECT domain(url) AS d, count() AS n
      FROM (SELECT concat('https://example.com/t/', event_type) AS url
            FROM events)
      GROUP BY d ORDER BY n DESC""") > 0)
    assert(run("""
      SELECT formatDateTime(ts, '%Y-%m') AS ym,
        uniqExact(user_id) AS users
      FROM events GROUP BY ym ORDER BY ym""") > 0)
  }

  test("dialect statement shapes execute") {
    assert(run("SELECT count() FROM orders SAMPLE 0.5 SETTINGS max_threads = 4") == 1)
    assert(run("""
      SELECT DISTINCT ON (o_orderpriority) o_orderpriority, o_orderkey
      FROM orders ORDER BY o_orderpriority, o_orderkey""") == 5)
    assert(run("SELECT TOP 7 o_orderkey FROM orders ORDER BY o_orderkey") == 7)
    assert(run("""
      SELECT o_orderkey FROM orders
      WHERE o_custkey GLOBAL IN (SELECT c_custkey FROM customer LIMIT 10)
      ORDER BY o_orderkey LIMIT 5""") > 0)
  }

  test("query-parameter substitution never fires inside string literals") {
    // an unset parameter INSIDE a literal must survive verbatim — if the
    // substitution touched literal segments this would throw "not set"
    val r = graft.sql.ClickHouseSql.sql(spark,
      "SELECT '{nosuchparam:Int32}' AS s, length('a {x:String} b') AS n")
      .head()
    assert(r.getString(0) == "{nosuchparam:Int32}" && r.getInt(1) == 14)
    // outside a literal, an unset parameter IS loud
    val err = intercept[IllegalArgumentException] {
      graft.sql.ClickHouseSql.sql(spark,
        "SELECT {nosuchparam:Int32} AS v")
    }
    assert(err.getMessage.contains("nosuchparam"))
    // type checking rejects a non-integer value for an integer hole
    graft.sql.ClickHouseSql.sql(spark, "SET param_tt = 'abc'")
    val err2 = intercept[Exception] {
      graft.sql.ClickHouseSql.sql(spark, "SELECT {tt:UInt32} AS v")
    }
    assert(err2.getMessage.contains("not"))
    spark.conf.unset("graft.ch.param_tt")
  }

  test("round-9 statement forms parse with hostile spacing and casing") {
    val ch = (s: String) => graft.sql.ClickHouseSql.sql(spark, s)
    val sp = spark; import sp.implicits._
    // mixed-case multi-space REPLACE PARTITION; quoted and bare values
    Seq("tort_rp_a", "tort_rp_b", "tort_rmv", "tort_ud").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(wh, true)
      fs.delete(new org.apache.hadoop.fs.Path(wh.toString + "_dropped"), true)
    }
    Seq((1, "x", 0), (2, "y", 1)).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").saveAsTable("tort_rp_a")
    Seq((9, "z", 1)).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").saveAsTable("tort_rp_b")
    ch("alter   TABLE tort_rp_a   replace PARTITION 1 from   tort_rp_b ;")
    assert(spark.table("tort_rp_a")
      .filter(org.apache.spark.sql.functions.col("p") === 1)
      .select("k").head().getInt(0) == 9)
    // refreshable MV with lowercase refresh clause + trailing semicolon
    ch("create materialized view tort_rmv refresh every 2 minute as " +
      "select count() as n from tort_rp_a;")
    assert(ch("SHOW CREATE TABLE tort_rmv").head().getString(0)
      .contains("REFRESH EVERY 2 MINUTE"))
    ch("SYSTEM   REFRESH   VIEW tort_rmv")
    // LIMIT BY with BOTH a per-key offset and a trailing row limit
    Tables.register(spark, sf)
    val rows = ch("""SELECT n_regionkey AS r, n_nationkey AS k FROM nation
      ORDER BY k LIMIT 1 OFFSET 1 BY r LIMIT 3""").collect()
    assert(rows.length == 3)
    // UNDROP right after two DROPs of the same name restores the LAST drop
    ch("CREATE MATERIALIZED VIEW tort_ud AS SELECT 1 AS a")
    ch("DROP TABLE tort_ud")
    ch("CREATE MATERIALIZED VIEW tort_ud AS SELECT 2 AS a")
    ch("DROP TABLE tort_ud")
    ch("UNDROP TABLE tort_ud")
    assert(spark.table("tort_ud").head().getInt(0) == 2)
    spark.sql("DROP TABLE tort_ud")
    spark.sql("DROP TABLE tort_rmv")
  }

  test("combinator and conversion shapes execute") {
    assert(run("""
      SELECT multiIf(o_totalprice > 300000, 'high',
                     o_totalprice > 100000, 'mid', 'low') AS band,
        count() AS n, round(avgIf(o_totalprice, o_orderstatus != 'P'), 2) AS a
      FROM orders GROUP BY band ORDER BY band""") == 3)
    assert(run("""
      SELECT toInt32OrZero(o_orderpriority) AS z,
        accurateCastOrNull(o_orderkey, 'Int32') AS k
      FROM orders ORDER BY o_orderkey LIMIT 5""") == 5)
  }
}
