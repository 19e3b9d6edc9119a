package graft

import graft.operators.ResultCache
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Pins the query-result-cache reuse semantics
  * (ref src/Interpreters/Cache/QueryResultCache.cpp): canonical-plan
  * keying, hit/miss accounting, InMemoryRelation reuse, LRU eviction
  * with eager unpersist. */
class ResultCacheSpec extends SparkFunSuite {

  private def lineitem = Tables.load(spark, sf, "lineitem")

  test("identical queries share one entry; Catalyst-equivalent plans hit") {
    val cache = new ResultCache(maxEntries = 8)
    val q1 = cache.cached(lineitem.groupBy("l_returnflag").count())
    assert(q1.count() > 0) // materialize
    val q2 = cache.cached(lineitem.groupBy("l_returnflag").count())
    assert(cache.hits == 1 && cache.misses == 1 && cache.size == 1)
    // the reused frame reads from the persisted result blocks
    assert(q2.queryExecution.optimizedPlan.exists(_.isInstanceOf[InMemoryRelation]))
    assert(q1.collect().toSet == q2.collect().toSet)
  }

  test("different queries miss; results stay correct") {
    val cache = new ResultCache(maxEntries = 8)
    val a = cache.cached(lineitem.selectExpr("sum(l_quantity) AS s"))
    val b = cache.cached(lineitem.selectExpr("sum(l_extendedprice) AS s"))
    assert(cache.misses == 2 && cache.hits == 0 && cache.size == 2)
    assert(a.head.get(0) != b.head.get(0))
  }

  test("LRU eviction is bounded and unpersists the coldest entry") {
    val cache = new ResultCache(maxEntries = 2)
    val a = cache.cached(lineitem.selectExpr("count(*) AS c"))
    a.count()
    cache.cached(lineitem.selectExpr("max(l_tax) AS m"))
    cache.cached(lineitem.selectExpr("min(l_tax) AS m")) // evicts `a`
    assert(cache.size == 2)
    // re-requesting the evicted query is a miss again (fresh admission)
    cache.cached(lineitem.selectExpr("count(*) AS c"))
    assert(cache.misses == 4 && cache.size == 2)
  }

  test("clear drops all entries") {
    val cache = new ResultCache(maxEntries = 4)
    cache.cached(lineitem.selectExpr("count(*) AS c"))
    cache.clear()
    assert(cache.size == 0)
  }

  test("SET use_query_cache = 1 routes dialect SELECTs through the cache") {
    import graft.sql.ClickHouseSql
    Tables.register(spark, sf)
    ClickHouseSql.sql(spark, "SYSTEM DROP QUERY CACHE")
    val h0 = ClickHouseSql.queryCache.hits
    ClickHouseSql.sql(spark, "SET use_query_cache = 1")
    try {
      val q = "SELECT r_regionkey, count() AS n FROM region GROUP BY r_regionkey ORDER BY r_regionkey"
      val a = ClickHouseSql.sql(spark, q); a.collect()
      val b = ClickHouseSql.sql(spark, q)
      assert(ClickHouseSql.queryCache.hits == h0 + 1,
        "second identical SELECT did not hit the query cache")
      assert(b.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[InMemoryRelation]))
      assert(a.collect().toSeq == b.collect().toSeq)
      // SYSTEM DROP QUERY CACHE empties it
      ClickHouseSql.sql(spark, "SYSTEM DROP QUERY CACHE")
      assert(ClickHouseSql.queryCache.size == 0)
    } finally {
      spark.conf.unset("graft.ch.use_query_cache")
      ClickHouseSql.sql(spark, "SYSTEM DROP QUERY CACHE")
    }
  }
}