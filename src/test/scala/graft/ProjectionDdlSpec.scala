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

  test("mutations rebuild registered projections — no stale rollup answers") {
    Tables.register(spark, sf)
    ClickHouseSql.sql(spark, "DROP TABLE IF EXISTS pddl_mut")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "pddl_mut")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    ClickHouseSql.sql(spark, """
      CREATE MATERIALIZED VIEW pddl_mut AS
      SELECT n_nationkey, n_regionkey FROM nation""")
    ClickHouseSql.sql(spark, """
      ALTER TABLE pddl_mut ADD PROJECTION byreg
      (SELECT n_regionkey, sum(n_nationkey) GROUP BY n_regionkey)""")
    try {
      def probe(): Map[Int, Long] = ClickHouseSql.sql(spark, """
        SELECT n_regionkey, count() AS n FROM pddl_mut
        GROUP BY n_regionkey ORDER BY n_regionkey""")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(probe()(4) == 5L)
      // the mutation deletes region 4; the projection MUST follow —
      // a stale rollup would keep answering 5
      ClickHouseSql.sql(spark, "ALTER TABLE pddl_mut DELETE WHERE n_regionkey = 4")
      val after = probe()
      assert(!after.contains(4), s"stale projection after mutation: $after")
      assert(after(0) == 5L)
    } finally ClickHouseSql.sql(spark,
      "ALTER TABLE pddl_mut DROP PROJECTION byreg")
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
