package graft

import graft.sql.ClickHouseSql
import org.apache.spark.sql.functions._

/** ALTER TABLE ... ADD/DROP/MATERIALIZE PROJECTION DDL wired onto the two
  * projection rewrite rules (reference ParserProjectionDeclaration). */
class ProjectionDdlSpec extends SparkFunSuite {

  test("aggregate-projection DDL: GROUP BY answers from the rollup") {
    Tables.register(spark, sf)
    ClickHouseSql.sql(spark, """
      CREATE MATERIALIZED VIEW pddl_t AS
      SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem""")
    ClickHouseSql.sql(spark, """
      ALTER TABLE pddl_t ADD PROJECTION p1 (
        SELECT l_returnflag, sum(l_quantity), count()
        GROUP BY l_returnflag, l_linestatus)""")
    try {
      val q = ClickHouseSql.sql(spark, """
        SELECT l_returnflag, count() AS n, CAST(sum(l_quantity) AS DOUBLE) AS q
        FROM pddl_t GROUP BY l_returnflag ORDER BY l_returnflag""")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("__sum_l_quantity"),
        s"DDL-declared projection did not rewrite the aggregate:\n$plan")
      // values equal the direct aggregate
      val direct = spark.table("pddl_t").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").cast("double").as("q"))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
      assert(q.collect().map(_.toString).toSeq == direct)
      // MATERIALIZE is an accepted no-op
      val st = ClickHouseSql.sql(spark,
        "ALTER TABLE pddl_t MATERIALIZE PROJECTION p1").collect()
      assert(st.head.getString(0) == "OK")
    } finally ClickHouseSql.sql(spark, "ALTER TABLE pddl_t DROP PROJECTION p1")
    // after DROP the rewrite no longer fires
    val after = ClickHouseSql.sql(spark, """
      SELECT l_returnflag, count() AS n FROM pddl_t
      GROUP BY l_returnflag ORDER BY l_returnflag""")
    assert(!after.queryExecution.optimizedPlan.toString.contains("__cnt"))
  }

  test("normal-projection DDL: ORDER BY body creates the bucketed layout") {
    Tables.register(spark, sf)
    ClickHouseSql.sql(spark, """
      CREATE MATERIALIZED VIEW pddl_n AS
      SELECT l_orderkey, l_quantity FROM lineitem""")
    ClickHouseSql.sql(spark, """
      ALTER TABLE pddl_n ADD PROJECTION byorder (SELECT * ORDER BY l_orderkey)""")
    try {
      val q = spark.table("pddl_n").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("pddl_n__proj_byorder"),
        s"DDL-declared normal projection did not substitute the layout:\n$plan")
      assert(!q.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally ClickHouseSql.sql(spark,
      "ALTER TABLE pddl_n DROP PROJECTION byorder")
  }
}
