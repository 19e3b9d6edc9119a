package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Mutations
import org.apache.spark.sql.functions._

/** Batch mutation + TTL queries (round-2 verdict missing #1): ALTER
  * UPDATE/DELETE re-expressed as declarative rewrites
  * (src/Interpreters/MutationsInterpreter.h:44) and TTL row/column sweeps
  * (src/Processors/Transforms/TTLTransform.cpp), each proven by an oracle
  * that recomputes the mutation in plain SQL.
  */
object MutationQueries extends QueryPack {

  /** OPTIMIZE TABLE ... FINAL DEDUPLICATE (InterpreterOptimizeQuery +
    * merge-time dedup): a table seeded with every nation row TWICE
    * collapses back to one row per key; BY-column form dedups on the key
    * only. Exact oracle: the distinct nation table. */
  private val optimizeDedup = graft.Q("q_ch_optimize_dedup", (s, dir) => {
    Tables.register(s, dir)
    graft.sql.ClickHouseSql.sql(s, """
      CREATE MATERIALIZED VIEW opt_dedup_t AS
      SELECT * FROM (SELECT n_nationkey, n_name FROM nation
                     UNION ALL SELECT n_nationkey, n_name FROM nation)""")
    graft.sql.ClickHouseSql.sql(s,
      "OPTIMIZE TABLE opt_dedup_t FINAL DEDUPLICATE")
    graft.sql.ClickHouseSql.sql(s, """
      SELECT n_nationkey, n_name FROM opt_dedup_t ORDER BY n_nationkey""")
  }, Some("""
    SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"""))

  /** The reference's canonical mutation statement forms (ParserAlterQuery
    * → MutationsInterpreter): ALTER TABLE … UPDATE … WHERE and ALTER
    * TABLE … DELETE WHERE through the SQL dialect, same semantics as the
    * operator-level q_mutation_update_delete. Oracle recomputes both
    * mutations in plain SQL over the source table. */
  private val alterUpdateDelete = graft.Q("q_ch_alter_update_delete", (s, dir) => {
    Tables.register(s, dir)
    graft.sql.ClickHouseSql.sql(s, """
      CREATE MATERIALIZED VIEW alter_mut_t AS
      SELECT n_nationkey, n_name, n_regionkey FROM nation""")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_mut_t UPDATE n_name = concat(n_name, '_EU') " +
        "WHERE n_regionkey = 3")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_mut_t DELETE WHERE n_regionkey = 4")
    graft.sql.ClickHouseSql.sql(s, """
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
        CAST(n_regionkey AS BIGINT) AS r
      FROM alter_mut_t ORDER BY k""")
  }, Some("""
    SELECT CAST(n_nationkey AS BIGINT) AS k,
      CASE WHEN n_regionkey = 3 THEN n_name || '_EU' ELSE n_name END AS n_name,
      CAST(n_regionkey AS BIGINT) AS r
    FROM nation WHERE n_regionkey <> 4 ORDER BY k"""))

  /** Schema-evolution DDL roundtrip (src/Storages/AlterCommands.cpp): all
    * four column verbs through the dialect — ADD with an expression
    * DEFAULT (backfill visible to SELECT) and a position clause, MODIFY
    * type cast, RENAME, DROP. The final SELECT * makes every verb
    * hash-verified: a lingering note column (DROP failed), a missing pop
    * backfill (ADD DEFAULT failed), an un-renamed r_name, or an INT pop
    * (MODIFY failed) each breaks the schema/hash compare. */
  private val alterColumn = graft.Q("q_ch_alter_column", (s, dir) => {
    Tables.register(s, dir)
    graft.sql.ClickHouseSql.sql(s, """
      CREATE MATERIALIZED VIEW alter_col_t AS
      SELECT r_regionkey, r_name, 'scratch' AS note FROM region""")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_col_t ADD COLUMN pop UInt16 DEFAULT 40 + 2")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_col_t ADD COLUMN tag String AFTER r_name")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_col_t MODIFY COLUMN pop Int64")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_col_t RENAME COLUMN r_name TO region_name")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE alter_col_t DROP COLUMN note")
    graft.sql.ClickHouseSql.sql(s,
      "SELECT * FROM alter_col_t ORDER BY r_regionkey")
  }, Some("""
    SELECT r_regionkey, r_name AS region_name, CAST(NULL AS VARCHAR) AS tag,
      CAST(42 AS BIGINT) AS pop
    FROM region ORDER BY r_regionkey"""))

  /** TTL statement forms (round 8 — src/Storages/TTLDescription.cpp;
    * MATERIALIZE TTL forces the mutation the reference's merges apply):
    * a 100-year TTL keeps everything, a 30-day TTL over the 2024-dated
    * events expires everything — both extremes deterministic against
    * wall-clock for the next ~98 years, which is what makes the DDL
    * oracle-able. */
  private val alterTtlQ = graft.Q("q_ch_modify_ttl", (s, dir) => {
    Tables.register(s, dir)
    graft.sql.ClickHouseSql.sql(s, """
      CREATE MATERIALIZED VIEW ttl_stmt_t AS
      SELECT ts, value FROM events""")
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE ttl_stmt_t MODIFY TTL ts + INTERVAL 36500 DAY")
    graft.sql.ClickHouseSql.sql(s, "ALTER TABLE ttl_stmt_t MATERIALIZE TTL")
    val kept = s.table("ttl_stmt_t").count()
    graft.sql.ClickHouseSql.sql(s,
      "ALTER TABLE ttl_stmt_t MODIFY TTL ts + INTERVAL 30 DAY DELETE")
    graft.sql.ClickHouseSql.sql(s, "ALTER TABLE ttl_stmt_t MATERIALIZE TTL")
    val gone = s.table("ttl_stmt_t").count()
    import s.implicits._
    Seq((kept, gone)).toDF("n_keep", "n_gone")
  }, Some("""
    SELECT (SELECT COUNT(*) FROM events) AS n_keep,
      CAST(0 AS BIGINT) AS n_gone"""))

  /** CLEAR COLUMN IN PARTITION (round 8 — AlterCommands' clear_column):
    * n_name resets to NULL inside partition r=2 only; other partitions
    * keep their values. Oracle recomputes the conditional null-out. */
  private val clearColumn = graft.Q("q_ch_clear_column", (s, dir) => {
    Tables.register(s, dir)
    val t = "graft_clearcol_t"
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), t)
    wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
    Tables.load(s, dir, "nation")
      .write.partitionBy("n_regionkey").saveAsTable(t)
    graft.sql.ClickHouseSql.sql(s,
      s"ALTER TABLE $t CLEAR COLUMN n_name IN PARTITION '2'")
    val out = graft.sql.ClickHouseSql.sql(s, s"""
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
        CAST(n_regionkey AS BIGINT) AS r
      FROM $t ORDER BY k""")
    out
  }, Some("""
    SELECT CAST(n_nationkey AS BIGINT) AS k,
      CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END AS n_name,
      CAST(n_regionkey AS BIGINT) AS r
    FROM nation ORDER BY k"""))

  /** Partition-scoped OPTIMIZE DEDUPLICATE (round 8 — previously this
    * form silently skipped the dedup): nation doubled in every region,
    * only region 2's partition deduplicates; other regions stay doubled.
    * Oracle recomputes the per-region expectation. */
  private val optimizePartition = graft.Q("q_ch_optimize_partition", (s, dir) => {
    Tables.register(s, dir)
    val t = "graft_optpart_t"
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), t)
    wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_regionkey")
    n.unionAll(n).write.partitionBy("n_regionkey").saveAsTable(t)
    graft.sql.ClickHouseSql.sql(s,
      s"OPTIMIZE TABLE $t PARTITION '2' FINAL DEDUPLICATE")
    graft.sql.ClickHouseSql.sql(s, s"""
      SELECT CAST(n_regionkey AS BIGINT) AS r, count() AS n
      FROM $t GROUP BY n_regionkey ORDER BY r""")
  }, Some("""
    SELECT CAST(n_regionkey AS BIGINT) AS r,
      CAST(CASE WHEN n_regionkey = 2 THEN COUNT(*) ELSE 2 * COUNT(*) END
        AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey ORDER BY r"""))

  override def queries: Seq[Q] = Seq(
    optimizeDedup,
    alterUpdateDelete,
    alterColumn,
    alterTtlQ,
    clearColumn,
    optimizePartition,

    // ALTER UPDATE (discount zeroed for small 'R' lines) then ALTER DELETE
    // (pre-1996 shipments dropped) — the post-mutation table aggregated so
    // both the update and the delete are visible in the checksum.
    Q.df("q_mutation_update_delete", """
      WITH m AS (
        SELECT l_returnflag,
          CASE WHEN l_returnflag = 'R' AND l_quantity < 10
               THEN 0.0 ELSE l_discount END AS d,
          l_quantity, l_shipdate
        FROM lineitem)
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(d AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM m
      WHERE NOT (l_shipdate < TIMESTAMP '1996-01-01')
      GROUP BY l_returnflag
      ORDER BY l_returnflag""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val updated = Mutations.update(li,
        col("l_returnflag") === "R" && col("l_quantity") < 10,
        Map("l_discount" -> lit(0.0)))
      val survived = Mutations.delete(updated,
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      survived.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_discount").cast("decimal(18,2)")).cast("double").as("sum_disc"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // TTL sweep over events: rows older than Jan 10 expire entirely; the
    // value COLUMN expires (nulls) on rows older than Jan 20.
    Q.df("q_ttl_sweep", """
      WITH t AS (
        SELECT event_type,
          CASE WHEN ts >= TIMESTAMP '2024-01-20' THEN value END AS v
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10')
      SELECT event_type, COUNT(*) AS n_rows, COUNT(v) AS n_live_values,
        CAST(SUM(CAST(ROUND(v * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_v
      FROM t
      GROUP BY event_type
      ORDER BY event_type""") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val rowSwept = Mutations.ttlRows(ev, col("ts"),
        lit("2024-01-10").cast("timestamp"))
      val colSwept = Mutations.ttlColumn(rowSwept, "value", col("ts"),
        lit("2024-01-20").cast("timestamp"))
      colSwept.groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_live_values"),
          (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0).as("sum_v"))
        .orderBy("event_type")
    }
  )
}
