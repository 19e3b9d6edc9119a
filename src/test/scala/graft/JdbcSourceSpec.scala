package graft

import graft.sources.JdbcSource

class JdbcSourceSpec extends SparkFunSuite {

  test("mysql/postgresql/sqlite table functions map to the jdbc option surface") {
    val my = JdbcSource.optionMap(
      JdbcSource.mysql("db1:3306", "shop", "orders", "u", "p"))
    assert(my("url") == "jdbc:mysql://db1:3306/shop")
    assert(my("dbtable") == "orders" && my("user") == "u" && my("password") == "p")
    assert(my("driver") == "com.mysql.cj.jdbc.Driver")
    assert(my("pushDownPredicate") == "true" && my("pushDownLimit") == "true")

    val pg = JdbcSource.optionMap(
      JdbcSource.postgresql("db2:5432", "dw", "public.lineitem", "u", "p"))
    assert(pg("url") == "jdbc:postgresql://db2:5432/dw")
    assert(pg("dbtable") == "public.lineitem")
    assert(pg("driver") == "org.postgresql.Driver")

    val lite = JdbcSource.optionMap(JdbcSource.sqlite("/data/x.db", "t"))
    assert(lite("url") == "jdbc:sqlite:/data/x.db" && lite("dbtable") == "t")
  }

  test("partitioned read carries the range-slice surface for parallel scans") {
    val o = JdbcSource.partitioned(
      JdbcSource.mysql("h:3306", "d", "big", "u", "p"),
      "id", 0L, 1000000L, 64)
    val m = JdbcSource.optionMap(o)
    assert(m("partitionColumn") == "id")
    assert(m("lowerBound") == "0" && m("upperBound") == "1000000")
    assert(m("numPartitions") == "64")
    // reader construction must not resolve the source (no driver jar here)
    JdbcSource.reader(SparkTestBase.spark, o)
  }
}
