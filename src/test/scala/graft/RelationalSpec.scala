package graft

import graft.queries.Relational

class RelationalSpec extends SparkFunSuite {

  test("driver contract: query names unique across packs, entry returns rows") {
    val all = SparkEntry.packs.flatMap(_.queries).map(_.name)
    val dups = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty,
      s"duplicate query names silently collapse in SparkEntry.queries: ${dups.mkString(", ")}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every relational query runs and returns a sane schema") {
    Relational.queries.foreach { q =>
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      assert(df.count() >= 0, s"${q.name}: count failed")
    }
  }

  test("q1 pricing summary has the 6 flag/status groups with exact sums") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey.keySet == Set(("A", "F"), ("A", "O"), ("N", "F"),
      ("N", "O"), ("R", "F"), ("R", "O")))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)   // sum_qty
      assert(r.getLong(8) > 0L)      // count_order
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k)))
  }
}
