package graft

import graft.sql.ClickHouseSql
import org.apache.spark.sql.functions._

/** Round-9 lifecycle DDL + ADVICE-regression pins:
  *  - REPLACE/MOVE/FETCH PARTITION, UNDROP, refreshable MV, DEDUPLICATE
  *    BY, LIMIT-OFFSET-BY, Dynamic type (LifecycleQueries' oracle logic
  *    asserted in-process at sf0.001);
  *  - the five r8 ADVICE fixes each pinned by the failure they fixed. */
class LifecycleSpec extends SparkFunSuite {

  private def ch(sql: String) = ClickHouseSql.sql(spark, sql)

  private def scratch(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(wh, true)
    Seq("_dropped", "__altering", "_detached").foreach(sfx =>
      fs.delete(new org.apache.hadoop.fs.Path(wh.toString + sfx), true))
  }

  test("REPLACE PARTITION FROM swaps one partition, leaves the rest") {
    val out = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_replace_partition").get.run(spark, sf)
      .collect()
    assert(out.length == 25)
    assert(out.filter(_.getLong(2) == 2L).forall(_.getString(1).endsWith("_NEW")))
    assert(out.filter(_.getLong(2) != 2L).forall(!_.getString(1).endsWith("_NEW")))
    // staging table intact (REPLACE copies, never moves)
    assert(spark.table("graft_repl_stage").count() ==
      spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_regionkey") === 2).count())
  }

  test("MOVE PARTITION TO TABLE moves (not copies)") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_move_partition").get.run(spark, sf)
      .collect().head
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val r3 = n.filter(col("n_regionkey") === 3).count()
    assert(r.getLong(0) == n.count() - r3)
    assert(r.getLong(1) == r3)
  }

  test("FETCH PARTITION lands detached; ATTACH admits it") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_fetch_partition").get.run(spark, sf)
      .collect().head
    assert(r.getString(0) == "n_regionkey=1")
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) ==
      spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_regionkey") === 1).count())
  }

  test("DROP TABLE → UNDROP TABLE restores name and data") {
    val rows = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_undrop").get.run(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getInt(2) == 0)) // invisible while dropped
    // a second UNDROP has nothing to restore
    val e = intercept[IllegalArgumentException] { ch("UNDROP TABLE graft_undrop_t") }
    assert(e.getMessage.contains("no dropped table"))
  }

  test("refreshable MV: stale until SYSTEM REFRESH VIEW; schedule visible") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_refresh_mv").get.run(spark, sf).collect().head
    val n = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(r.getLong(0) == n, "MV must be STALE before the refresh")
    assert(r.getLong(1) == 2 * n, "MV must reflect the insert after refresh")
    assert(r.getInt(2) == 1, "SHOW CREATE must render the schedule")
    assert(r.getLong(3) == 1L)
    // refreshing a non-refreshable name is loud
    val e = intercept[IllegalArgumentException] { ch("SYSTEM REFRESH VIEW nope_v") }
    assert(e.getMessage.contains("not a refreshable"))
  }

  test("OPTIMIZE DEDUPLICATE BY col-list keeps one row per key") {
    val rows = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_optimize_dedup_by").get.run(spark, sf).collect()
    assert(rows.length == 25 && rows.forall(_.getLong(1) == 1L))
    // without BY, the same corpus keeps both payload variants
    assert(spark.table("graft_dedup_by_t").count() == 25)
  }

  test("LIMIT n OFFSET m BY and the comma form agree") {
    Tables.register(spark, sf)
    val a = ch("""SELECT n_regionkey AS r, n_nationkey AS k FROM nation
      ORDER BY k LIMIT 2 OFFSET 1 BY r""").collect()
    val b = ch("""SELECT n_regionkey AS r, n_nationkey AS k FROM nation
      ORDER BY k LIMIT 1, 2 BY r""").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // 5 regions x 2 rows, never the per-region minimum key
    assert(a.length == 10)
    val minKeys = spark.read.parquet(s"$sf/nation.parquet")
      .groupBy("n_regionkey").agg(min("n_nationkey").as("mk"))
      .collect().map(r => (r.get(0), r.get(1))).toSet
    assert(a.forall(r => !minKeys.contains((r.get(0), r.get(1)))))
  }

  test("Dynamic type: dynamicType names + typed dynamicElement extraction") {
    val rows = queries.LifecycleQueries.queries
      .find(_.name == "q_dynamic_typed").get.run(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val k = r.getInt(0)
      k % 3 match {
        case 0 =>
          assert(r.getString(1) == "Int64" && r.getLong(2) == k && r.isNullAt(3))
        case 1 =>
          assert(r.getString(1) == "String" && r.isNullAt(3))
        case _ =>
          assert(r.getString(1) == "Array(Int64)" && r.isNullAt(2) &&
            r.getLong(3) == k)
      }
    }
  }

  test("system.detached_parts / projections / errors are scoped and live") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_system_maintenance").get.run(spark, sf).collect().head
    assert(r.getString(0) == "n_regionkey=4")
    assert(r.getString(1) == "p_maint:aggregate")
    assert(r.getLong(2) == 1L)
  }

  test("mutation-rewrite headliner matches the plain-SQL recompute") {
    val rows = queries.LifecycleQueries.queries
      .find(_.name == "q_mutation_rewrite").get.run(spark, sf).collect()
    // r10: the UPDATE targets ONE partition (l_returnflag='R') — the
    // others pass through unmutated, and the rewrite must be pruned
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R" && col("l_quantity") < 10,
            lit(0.0).cast("decimal(18,2)"))
          .otherwise(col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc"))
      .orderBy("l_returnflag").collect()
    assert(rows.map(_.toString).toSeq == expect.map(_.toString).toSeq)
    val st = operators.DurableRewrite.stats.get("graft_mutbench_t")
    assert(st == operators.DurableRewrite.Result(1, 2),
      s"pruned rewrite expected (1 rewritten, 2 untouched), got $st")
  }

  test("BACKUP TABLE → mutate → RESTORE TABLE roundtrips byte-exact") {
    val rows = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_backup_restore").get.run(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getString(4) == "BACKUP_CREATED,RESTORED"))
    val expectCorrupted = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_regionkey") < 2).count()
    assert(rows.forall(_.getLong(3) == expectCorrupted))
    // RESTORE of a non-existent backup is loud
    val e = intercept[IllegalArgumentException] {
      ch("RESTORE TABLE nope_t FROM File('/tmp/graft_no_such_backup')")
    }
    assert(e.getMessage.contains("no backup"))
  }

  test("system.time_zones / build_options / warnings / replicas / moves") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_system_breadth").get.run(spark, sf).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 1 && r.getLong(2) == 0 &&
      r.getLong(3) == 0 && r.getLong(4) == 0)
  }

  test("RBAC: role-carried grants enforce; revoke immediate; admin gated") {
    try {
      val r = queries.LifecycleQueries.queries
        .find(_.name == "q_ch_rbac").get.run(spark, sf).collect().head
      assert(r.getLong(0) == 25L, "granted SELECT must read")
      assert(r.getLong(1) == 1L, "ungranted INSERT must be denied")
      assert(r.getLong(2) == 1L, "non-default user cannot administer")
      assert(r.getString(3) == "GRANT rbac_reader TO rbac_alice")
      assert(r.getLong(4) == 1L, "revoke must take effect immediately")
    } finally ch("SET user = 'default'")
    // wildcard target + unknown-user loudness
    ch("CREATE USER IF NOT EXISTS rbac_root")
    ch("GRANT ALL ON *.* TO rbac_root")
    ch("SET user = 'rbac_root'")
    try assert(ch("SELECT count() AS n FROM graft_rbac_t").collect()
      .head.getLong(0) == 25L)
    finally ch("SET user = 'default'")
    ch("DROP USER rbac_root")
    ch("SET user = 'rbac_nobody'")
    try {
      val e = intercept[IllegalArgumentException] {
        ch("SELECT 1 AS x FROM graft_rbac_t")
      }
      assert(e.getMessage.contains("unknown user"))
    } finally ch("SET user = 'default'")
    // users/roles/grants introspection tables serve
    assert(ch("SELECT name FROM system.users").collect()
      .map(_.getString(0)).contains("default"))
  }

  test("row policies: covered user sees filtered rows; default unfiltered") {
    try {
      val r = queries.LifecycleQueries.queries
        .find(_.name == "q_ch_row_policy").get.run(spark, sf).collect().head
      val expect = spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_regionkey") < 2).count()
      assert(r.getLong(0) == expect, "policed read must be filtered")
      assert(r.getLong(1) == 1L, "filter must apply inside aggregates too")
      assert(r.getLong(2) == 25L, "default user reads unfiltered")
      assert(r.getLong(3) == 1L, "system.row_policies must list the policy")
    } finally ch("SET user = 'default'")
    // shadow retires with the user: the table name resolves unfiltered now
    assert(ch("SELECT count() AS n FROM graft_rp_t").collect()
      .head.getLong(0) == 25L)
  }

  test("plan-based gate: merge()/subquery reads and policy shadows can't bypass " +
      "grants (r10 verdict #5, ADVICE medium)") {
    val t = "graft_gate_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT n_nationkey, n_regionkey FROM nation")
    ch("CREATE USER IF NOT EXISTS gate_bob")
    try {
      // 1. SELECT via merge() over an ungranted table is denied — the
      //    gate expands the table-function regex to its catalog matches
      ch("SET user = 'gate_bob'")
      val e1 = intercept[SecurityException] {
        ch(s"SELECT count() AS n FROM merge('graft_gate_.*')")
      }
      assert(e1.getMessage.contains(t))
      // 2. an ungranted read nested in a subquery is denied too
      val e2 = intercept[SecurityException] {
        ch(s"SELECT 1 AS x WHERE 1 IN (SELECT n_nationkey FROM $t)")
      }
      assert(e2.getMessage.contains(t))
      // 3. ADVICE medium: a row-policy shadow must NOT bypass the grant
      //    check — revoked user keeps being denied on the policed table
      ch("SET user = 'default'")
      ch(s"GRANT SELECT ON $t TO gate_bob")
      ch(s"CREATE ROW POLICY gate_pol ON $t USING n_regionkey < 2 TO gate_bob")
      ch("SET user = 'gate_bob'")
      assert(ch(s"SELECT count() AS n FROM $t").collect().head.getLong(0) ==
        spark.read.parquet(s"$sf/nation.parquet")
          .filter(col("n_regionkey") < 2).count(), "granted+policed read filters")
      ch("SET user = 'default'")
      ch(s"REVOKE SELECT ON $t FROM gate_bob")
      ch("SET user = 'gate_bob'")
      intercept[SecurityException] { ch(s"SELECT count() AS n FROM $t") }
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch(s"DROP ROW POLICY gate_pol ON $t"))
      scala.util.Try(ch("DROP USER gate_bob"))
      scala.util.Try(ch(s"DROP TABLE $t"))
    }
  }

  test("standalone UPDATE is privilege-gated like ALTER TABLE UPDATE") {
    val t = "graft_gate_upd_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT n_nationkey AS k, 1 AS v FROM nation")
    ch("CREATE USER IF NOT EXISTS gate_upd_u")
    ch(s"GRANT SELECT ON $t TO gate_upd_u")
    try {
      ch("SET user = 'gate_upd_u'")
      val e = intercept[SecurityException] {
        ch(s"UPDATE $t SET v = 2 WHERE k = 1")
      }
      assert(e.getMessage.contains("ALTER"))
      ch("SET user = 'default'")
      ch(s"GRANT ALTER ON $t TO gate_upd_u")
      ch("SET user = 'gate_upd_u'")
      ch(s"UPDATE $t SET v = 2 WHERE k = 1") // granted: executes
      ch("SET user = 'default'")
      assert(ch(s"SELECT sum(v) AS s FROM $t").collect().head.getLong(0) == 26L)
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP USER IF EXISTS gate_upd_u"))
      scala.util.Try(ch(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("quotas: oracle lanes, window reset after the interval, errors metered") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_quota").get.run(spark, sf).collect().head
    assert(r.getLong(0) == 75L && r.getLong(1) == 1L && r.getLong(2) == 25L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L && r.getLong(5) == 4L)
    // window reset: a 1-second interval quota admits again after expiry
    val t = "graft_quota_win_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT 1 AS a")
    ch("CREATE USER IF NOT EXISTS quota_win_u")
    ch(s"GRANT SELECT ON $t TO quota_win_u")
    ch("CREATE QUOTA q_win FOR INTERVAL 1 second MAX queries = 1 TO quota_win_u")
    try {
      ch("SET user = 'quota_win_u'")
      assert(ch(s"SELECT count() AS n FROM $t").collect().head.getLong(0) == 1L)
      intercept[SecurityException] {
        ch(s"SELECT count() AS n FROM $t").collect()
      }
      Thread.sleep(1200)
      assert(ch(s"SELECT count() AS n FROM $t").collect().head.getLong(0) == 1L,
        "window must reset after the interval elapses")
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP QUOTA IF EXISTS q_win"))
      scala.util.Try(ch("DROP USER IF EXISTS quota_win_u"))
      scala.util.Try(ch(s"DROP TABLE $t"))
    }
    // errors metering: a failing statement charges the errors counter
    ch("CREATE USER IF NOT EXISTS quota_err_u")
    ch("CREATE QUOTA q_err FOR INTERVAL 1 hour MAX errors = 1 TO quota_err_u")
    try {
      ch("SET user = 'quota_err_u'")
      intercept[Exception] { ch("SELECT broken syntax here !!").collect() }
      ch("SET user = 'default'")
      val errs = ch("""SELECT CAST(errors AS BIGINT) AS e FROM system.quota_usage
        WHERE quota_name = 'q_err'""").collect().head.getLong(0)
      assert(errs == 1L, s"errors counter must record the failure, got $errs")
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP QUOTA IF EXISTS q_err"))
      scala.util.Try(ch("DROP USER IF EXISTS quota_err_u"))
    }
  }

  test("result_rows quota: charged after the query, trips the next statement") {
    Tables.register(spark, sf)
    val t = "graft_quota_rows_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT n_nationkey FROM nation")
    ch("CREATE USER IF NOT EXISTS quota_rows_u")
    ch(s"GRANT SELECT ON $t TO quota_rows_u")
    ch("CREATE QUOTA q_rows FOR INTERVAL 1 hour MAX result_rows = 30 " +
      "TO quota_rows_u")
    try {
      def usageRows(): Long = ch("""SELECT CAST(result_rows AS BIGINT) AS r
        FROM system.quota_usage WHERE quota_name = 'q_rows'""")
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
      // async listener dispatch: poll the charged counter to a floor
      def drainTo(floor: Long): Unit = {
        val deadline = System.nanoTime() + 10000L * 1000000L
        while (usageRows() < floor && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(usageRows() >= floor,
          s"listener charge stuck below $floor (at ${usageRows()})")
      }
      ch("SET user = 'quota_rows_u'")
      // 25 rows: under the limit, and charged only after completion
      assert(ch(s"SELECT n_nationkey FROM $t").collect().length == 25)
      ch("SET user = 'default'"); drainTo(25); ch("SET user = 'quota_rows_u'")
      // counter 25 <= 30: the next query still runs (…to 50)
      assert(ch(s"SELECT n_nationkey FROM $t").collect().length == 25)
      ch("SET user = 'default'"); drainTo(50); ch("SET user = 'quota_rows_u'")
      // counter 50 > 30: the NEXT statement is rejected (reference
      // semantics — the exceeding query itself completed)
      val e = intercept[SecurityException] {
        ch(s"SELECT n_nationkey FROM $t").collect()
      }
      assert(e.getMessage.contains("result_rows"))
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP QUOTA IF EXISTS q_rows"))
      scala.util.Try(ch("DROP USER IF EXISTS quota_rows_u"))
      scala.util.Try(ch(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("settings profile applies on SET user authentication") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_settings_profile").get.run(spark, sf).collect().head
    assert(r.getString(0) == "7")
    assert(r.getLong(1) == 1L)
    assert(r.getString(2) ==
      "CREATE SETTINGS PROFILE p_limits SETTINGS max_threads = 7, " +
        "max_memory_usage = 1000000 TO prof_dave")
    assert(r.getLong(3) == 1L)
  }

  test("SET ROLE narrows row-policy coverage too (policies ride the active set)") {
    val t = "graft_srp_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT n_nationkey, n_regionkey FROM nation")
    ch("CREATE USER IF NOT EXISTS srp_u")
    ch("CREATE ROLE IF NOT EXISTS srp_role")
    ch(s"GRANT SELECT ON $t TO srp_u")
    ch("GRANT srp_role TO srp_u")
    ch(s"CREATE ROW POLICY srp_pol ON $t USING n_regionkey = 0 TO srp_role")
    try {
      ch("SET user = 'srp_u'")
      val policed = ch(s"SELECT count() AS n FROM $t").collect().head.getLong(0)
      assert(policed == spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_regionkey") === 0).count(),
        "role-carried policy filters while the role is active")
      ch("SET ROLE NONE")
      val unpoliced = ch(s"SELECT count() AS n FROM $t").collect().head.getLong(0)
      assert(unpoliced == 25L,
        "SET ROLE NONE deactivates the role-carried policy")
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch(s"DROP ROW POLICY IF EXISTS srp_pol ON $t"))
      scala.util.Try(ch("DROP USER IF EXISTS srp_u"))
      scala.util.Try(ch("DROP ROLE IF EXISTS srp_role"))
      scala.util.Try(ch(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("UNDROP and RESTORE preserve managed/external identity") {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    def ttype(t: String) =
      spark.sessionState.catalog.getTableMetadata(TableIdentifier(t)).tableType
    val t = "graft_ident_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT 7 AS a")
    assert(ttype(t) == CatalogTableType.MANAGED)
    ch(s"BACKUP TABLE $t TO File('/tmp/graft_ident_bak')")
    ch(s"DROP TABLE $t")
    ch(s"UNDROP TABLE $t")
    assert(ttype(t) == CatalogTableType.MANAGED,
      "UNDROP must not convert a managed table to external")
    assert(spark.table(t).head().getInt(0) == 7)
    ch(s"RESTORE TABLE $t FROM File('/tmp/graft_ident_bak')")
    assert(ttype(t) == CatalogTableType.MANAGED,
      "RESTORE must not convert a managed table to external")
    assert(spark.table(t).head().getInt(0) == 7)
    // external table: UNDROP restores type + original location
    val e = "graft_ident_ext"
    scratch(e)
    val loc = s"/tmp/graft_ident_ext_${System.nanoTime()}"
    val sp = spark; import sp.implicits._
    Seq((1, "x")).toDF("k", "v").write.mode("overwrite").parquet(loc)
    spark.sql(s"CREATE TABLE $e (k INT, v STRING) USING parquet LOCATION '$loc'")
    ch(s"DROP TABLE $e")
    ch(s"UNDROP TABLE $e")
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(e))
    assert(meta.tableType == CatalogTableType.EXTERNAL)
    assert(meta.location.getPath == loc)
    assert(spark.table(e).count() == 1)
    spark.sql(s"DROP TABLE $e")
  }

  // ---- r8 ADVICE regression pins -------------------------------------

  test("ADVICE medium: OPTIMIZE PARTITION DEDUPLICATE keeps NULL-partition rows") {
    val t = "graft_nullpart_t"
    scratch(t)
    val sp = spark; import sp.implicits._
    // keys 1,2 in partition 'a' (2 duplicated), keys 3,4 with NULL partition
    Seq((1, "a"), (2, "a"), (2, "a"), (3, null), (4, null))
      .toDF("k", "p").write.partitionBy("p").saveAsTable(t)
    ch(s"OPTIMIZE TABLE $t PARTITION 'a' FINAL DEDUPLICATE")
    val left = spark.table(t).select("k").collect().map(_.getInt(0)).sorted
    assert(left.toSeq == Seq(1, 2, 3, 4),
      s"NULL-partition rows must survive a partition-scoped dedup, got ${left.toSeq}")
  }

  test("ADVICE low: evalMLMethod applies the sigmoid to logistic states only") {
    Tables.register(spark, sf)
    val r = ch("""
      SELECT
        evalMLMethod(stochasticLinearRegression(0.1, 0.0, 1, 'SGD')(y, x), 10.0) AS lin,
        evalMLMethod(stochasticLogisticRegression(0.1, 0.0, 1, 'SGD')(lbl, x), 10.0) AS logi
      FROM (SELECT CAST(n_nationkey AS DOUBLE) AS x,
                   CAST(3 * n_nationkey + 7 AS DOUBLE) AS y,
                   CAST(CASE WHEN n_nationkey > 12 THEN 1 ELSE 0 END AS DOUBLE) AS lbl
            FROM nation)""").collect().head
    assert(math.abs(r.getDouble(0) - 37.0) < 1e-6, s"linear stays raw: $r")
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0,
      s"logistic output must be a probability, got ${r.getDouble(1)}")
  }

  test("ADVICE low: system.numbers bound ignores an unrelated smaller LIMIT " +
      "and honors WHERE-only bounds above 2^20") {
    Tables.register(spark, sf)
    val a = ch("""
      SELECT (SELECT count(*) FROM (SELECT n_nationkey FROM nation LIMIT 10)) AS x,
             count(*) AS n
      FROM (SELECT number FROM system.numbers LIMIT 5000)""").collect().head
    assert(a.getLong(1) == 5000L,
      s"an unrelated LIMIT 10 must not truncate numbers: $a")
    val b = ch("SELECT count(*) AS n FROM system.numbers WHERE number < 2000000")
      .collect().head
    assert(b.getLong(0) == 2000000L)
    val e = intercept[IllegalArgumentException] {
      ch("SELECT count(*) AS n FROM system.numbers WHERE number < 500000000")
    }
    assert(e.getMessage.contains("materialization cap"))
  }

  test("ADVICE low: ALTER COLUMN on an external table keeps it external " +
      "at its original location") {
    val t = "graft_ext_alter_t"
    scratch(t)
    val loc = s"/tmp/graft_ext_alter_${System.nanoTime()}"
    val sp = spark; import sp.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.mode("overwrite").parquet(loc)
    spark.sql(s"CREATE TABLE $t (k INT, v STRING) USING parquet LOCATION '$loc'")
    ch(s"ALTER TABLE $t ADD COLUMN w Int64 DEFAULT 5")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    assert(meta.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
    assert(meta.location.getPath == loc)
    assert(spark.table(t).select("w").collect().map(_.getLong(0)).toSeq ==
      Seq(5L, 5L))
    spark.sql(s"DROP TABLE $t")
  }

  test("TextIndex: manifest makes append discovery metadata-only") {
    val base = s"/tmp/graft_manifest_${System.nanoTime()}"
    val sp = spark; import sp.implicits._
    val docs = (1 to 40).map(i => (i.toLong, s"alpha beta doc$i"))
      .toDF("doc_id", "text")
    operators.TextIndex.create(spark, docs, s"$base/data", s"$base/index", 4)
    val manifest = operators.TextIndex.readManifest(spark, s"$base/index")
    assert(manifest.isDefined && manifest.get.size == 4)
    val extra = Seq((100L, "gamma delta newdoc")).toDF("doc_id", "text")
    val newFiles = operators.TextIndex.append(
      spark, extra, s"$base/data", s"$base/index")
    assert(newFiles.size >= 1 &&
      newFiles.forall(f => !manifest.get.contains(
        new org.apache.hadoop.fs.Path(f).toUri.getPath)),
      "append must tokenize ONLY the delta files")
    val updated = operators.TextIndex.readManifest(spark, s"$base/index").get
    assert(updated.size == manifest.get.size + newFiles.size)
    // search still correct over old + new docs
    assert(operators.TextIndex.search(
      spark, s"$base/data", s"$base/index", Seq("gamma")).count() == 1)
    assert(operators.TextIndex.search(
      spark, s"$base/data", s"$base/index", Seq("alpha")).count() == 40)
    // legacy lane: an index without a manifest falls back to the postings
    // projection and gains a manifest on the next append
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/index/_manifest.txt"), false)
    val more = Seq((200L, "epsilon zeta lastdoc")).toDF("doc_id", "text")
    val newFiles2 = operators.TextIndex.append(
      spark, more, s"$base/data", s"$base/index")
    assert(newFiles2.size >= 1)
    assert(operators.TextIndex.readManifest(spark, s"$base/index").isDefined)
    assert(operators.TextIndex.search(
      spark, s"$base/data", s"$base/index", Seq("epsilon")).count() == 1)
    operators.TextIndex.drop(spark, s"$base/data", s"$base/index")
  }

  test("GRANT OPTION / ADMIN OPTION: delegated grant works, " +
      "non-delegated rejects, revoke strips the bit with the grant") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_grant_option").get.run(spark, sf)
      .collect().head
    assert(r.getLong(r.fieldIndex("peer_reads")) == 25L)
    assert(r.getLong(r.fieldIndex("plain_denied")) == 1L)
    assert(r.getLong(r.fieldIndex("plain_revoke_denied")) == 1L)
    assert(r.getLong(r.fieldIndex("peer_after_revoke")) == 1L)
    assert(r.getString(r.fieldIndex("shown_with"))
      .endsWith("WITH GRANT OPTION"))
    assert(!r.getString(r.fieldIndex("shown_stripped")).contains("OPTION"))
    assert(r.getLong(r.fieldIndex("lead_still_reads")) == 25L)
    assert(r.getLong(r.fieldIndex("lead_delegation_gone")) == 1L)
    assert(r.getLong(r.fieldIndex("peer_has_role")) == 1L)
    assert(r.getLong(r.fieldIndex("admin_gone")) == 1L)
  }

  test("LIVE VIEW oracle lane: q_ch_watch versions and freshness") {
    val r = queries.LifecycleQueries.queries
      .find(_.name == "q_ch_watch").get.run(spark, sf).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 2L)
    assert(r.getString(4) == "1,2,3")
    assert(r.getLong(5) == 27L)
  }

  test("system.part_log persists across restart via the warehouse sidecar") {
    val L = graft.sources.SystemTables.PartLogLedger
    L.clear()
    L.record("NewPart", "graft_plog_persist_t", "k=1")
    L.record("MutatePart", "graft_plog_persist_t", "k=1")
    // simulate a process restart: drop ALL in-memory state; the next
    // read must reload the sidecar (the reference's part_log is a real
    // table that survives restarts)
    L.resetMemoryForTest()
    val rows = ch("""SELECT event_type FROM system.part_log
      WHERE `table` = 'graft_plog_persist_t' ORDER BY event_type""")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("MutatePart", "NewPart"))
    L.clear()
    // cleared: sidecar gone too — a fresh load sees nothing
    L.resetMemoryForTest()
    assert(ch("""SELECT count() AS n FROM system.part_log
      WHERE `table` = 'graft_plog_persist_t'""")
      .collect().head.getLong(0) == 0L)
  }

  test("asynchronous_metrics serves OS/filesystem gauges honestly") {
    val m = ch("SELECT metric, value FROM system.asynchronous_metrics")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("FilesystemCapacity") >= m("FilesystemAvailable"))
    assert(m("OSMemoryTotal") >= m("OSMemoryFree"))
    assert(m("MemoryNonHeapUsed") > 0 && m("ProcessCpuTimeNs") > 0)
    assert(m.contains("NumberOfTables"))
  }

  test("PARALLEL WITH runs distinct-target legs concurrently, " +
      "same-table legs in statement order") {
    val t = "graft_pw_t"; val t2 = "graft_pw_t2"
    scratch(t); scratch(t2)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT CAST(1 AS BIGINT) AS a")
    // legs 1+3 share table t (ordered: insert THEN update sees it);
    // leg 2 creates t2 in parallel
    ch(s"INSERT INTO $t VALUES (10) " +
      s"PARALLEL WITH CREATE TABLE $t2 (b Int64) ENGINE = MergeTree ORDER BY b " +
      s"PARALLEL WITH UPDATE $t SET a = a * 2 WHERE a >= 10")
    val vals = spark.table(t).collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 20L),
      s"same-table legs must run in order: got $vals")
    assert(spark.catalog.tableExists(t2))
    scratch(t); scratch(t2)
  }

  // ---- round-12 ADVICE regressions ----------------------------------

  test("PARALLEL WITH: a leg reading a table another leg mutates orders " +
      "behind it (legs group by ALL referenced tables, not the target)") {
    val a = "graft_pw_dep_a"; val b = "graft_pw_dep_b"
    scratch(a); scratch(b)
    ch(s"CREATE TABLE $b (x Int64) ENGINE = MergeTree ORDER BY x")
    ch(s"INSERT INTO $b VALUES (1), (2), (3)")
    ch(s"CREATE TABLE $a (x Int64) ENGINE = MergeTree ORDER BY x")
    // the INSERT reads b; TRUNCATE mutates b — shared identifier b puts
    // both legs in one ordered group (the r11 grouping keyed only the
    // FIRST-referenced table: a vs b, and the two legs raced)
    ch(s"INSERT INTO $a SELECT x FROM $b PARALLEL WITH TRUNCATE TABLE $b")
    assert(spark.table(a).count() == 3L,
      "the reading leg must see the pre-TRUNCATE rows")
    assert(spark.table(b).count() == 0L)
    scratch(a); scratch(b)
  }

  test("PARALLEL WITH: same-target INSERT legs all land via per-leg " +
      "staging + append commit (existing rows kept, no leg lost)") {
    val t = "graft_pw_ccins"
    scratch(t)
    ch(s"CREATE TABLE $t (x Int64) ENGINE = MergeTree ORDER BY x")
    ch(s"INSERT INTO $t VALUES (0)")
    ch(s"INSERT INTO $t SELECT CAST(id AS BIGINT) + 1 AS x FROM range(3) " +
      s"PARALLEL WITH INSERT INTO $t VALUES (100), (101) " +
      s"PARALLEL WITH INSERT INTO $t SELECT CAST(200 AS BIGINT) AS x")
    val got = spark.table(t).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 100L, 101L, 200L), s"got $got")
    scratch(t)
  }

  test("PARALLEL WITH: COLUMN-LIST same-target INSERT legs run through " +
      "the concurrent append lane too; unlisted columns fill with NULL " +
      "(round-12 builder follow-up)") {
    val t = "graft_pw_collist"
    scratch(t)
    ch(s"CREATE TABLE $t (x Int64, y String, z Int64) " +
      "ENGINE = MergeTree ORDER BY x")
    ch(s"INSERT INTO $t VALUES (0, 'seed', 9)")
    ch(s"INSERT INTO $t (x, y) SELECT CAST(id AS BIGINT) + 1, 'a' " +
      s"FROM range(2) " +
      s"PARALLEL WITH INSERT INTO $t (z, x) VALUES (77, 100) " +
      s"PARALLEL WITH INSERT INTO $t (x) SELECT CAST(200 AS BIGINT)")
    val rows = spark.table(t).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      (0L, "seed", 9L),
      (1L, "a", -1L), (2L, "a", -1L),   // z unlisted → NULL
      (100L, null, 77L),                 // y unlisted → NULL, z=77
      (200L, null, -1L)), s"got $rows")
    scratch(t)
  }

  test("PARALLEL WITH: comma-separated FROM lists and default.-qualified " +
      "spellings land in the same ordering group as the bare name " +
      "(round-12 ADVICE legIdents fix)") {
    val a = "graft_pw_comma_a"; val b = "graft_pw_comma_b"
    val c = "graft_pw_comma_c"
    scratch(a); scratch(b); scratch(c)
    ch(s"CREATE TABLE $b (x Int64) ENGINE = MergeTree ORDER BY x")
    ch(s"INSERT INTO $b VALUES (1), (2)")
    ch(s"CREATE TABLE $c (y Int64) ENGINE = MergeTree ORDER BY y")
    ch(s"INSERT INTO $c VALUES (10)")
    ch(s"CREATE TABLE $a (x Int64, y Int64) ENGINE = MergeTree ORDER BY x")
    // the reading leg references b ONLY as the second element of a
    // comma-list, default-qualified — the old extractor missed it and
    // the TRUNCATE raced the read
    ch(s"INSERT INTO $a SELECT x, y FROM $c, default.$b " +
      s"PARALLEL WITH TRUNCATE TABLE $b")
    assert(spark.table(a).count() == 2L,
      "the reading leg must see the pre-TRUNCATE rows of b")
    assert(spark.table(b).count() == 0L)
    scratch(a); scratch(b); scratch(c)
  }

  test("GRANT OPTION target matching mirrors the read gate: a " +
      "db-qualified option grant covers the bare table name") {
    val t = "graft_go_suffix_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT 1 AS a")
    ch("CREATE USER IF NOT EXISTS go_suffix_u")
    ch("CREATE USER IF NOT EXISTS go_suffix_v")
    ch(s"GRANT SELECT ON default.$t TO go_suffix_u WITH GRANT OPTION")
    try {
      ch("SET user = 'go_suffix_u'")
      // r11 denied this: the option grant is stored as default.t but the
      // GRANT names the bare table — allowed() accepts the suffix match,
      // so delegation must too
      ch(s"GRANT SELECT ON $t TO go_suffix_v")
      ch("SET user = 'default'")
      val shown = ch("SHOW GRANTS FOR go_suffix_v").collect()
        .map(_.getString(0)).mkString("; ")
      assert(shown.toLowerCase.contains(t), s"grant missing: $shown")
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP USER IF EXISTS go_suffix_u"))
      scala.util.Try(ch("DROP USER IF EXISTS go_suffix_v"))
      scratch(t)
    }
  }

  test("part_log never mixes warehouses: switching sidecars clears the " +
      "in-memory ledger before reloading") {
    val L = graft.sources.SystemTables.PartLogLedger
    L.clear()
    L.record("NewPart", "graft_plog_switch_t", "k=1") // sidecar has 1 row
    // pretend the loaded state belongs to another warehouse: the next
    // read must CLEAR it, then reload this warehouse's sidecar — without
    // the clear the same event would appear twice (mixed histories)
    L.markForeignForTest()
    assert(ch("""SELECT count() AS n FROM system.part_log
      WHERE `table` = 'graft_plog_switch_t'""")
      .collect().head.getLong(0) == 1L)
    L.clear()
  }

  // ---- round-11 ADVICE regressions ----------------------------------

  test("quota charges ONCE per statement: OUTFILE core and PARALLEL WITH " +
      "legs are internal re-entries (QuotaCache::used)") {
    val t = "graft_quota_once_t"
    scratch(t)
    ch(s"CREATE MATERIALIZED VIEW $t AS SELECT 1 AS a")
    ch("CREATE USER IF NOT EXISTS quota_once_u")
    ch(s"GRANT SELECT ON $t TO quota_once_u")
    ch(s"GRANT INSERT ON $t TO quota_once_u")
    ch("CREATE QUOTA q_once FOR INTERVAL 1 hour MAX queries = 100 " +
      "TO quota_once_u")
    val tmp = java.nio.file.Files.createTempDirectory("graft_outfile")
      .resolve("out").toString
    def usage(counter: String): Long =
      ch(s"""SELECT CAST($counter AS BIGINT) AS c FROM system.quota_usage
        WHERE quota_name = 'q_once'""").collect()
        .headOption.map(_.getLong(0)).getOrElse(0L)
    try {
      ch("SET user = 'quota_once_u'")
      // one user statement with an internal re-entry for the core
      ch(s"SELECT a FROM $t INTO OUTFILE '$tmp' FORMAT CSV").collect()
      ch("SET user = 'default'")
      assert(usage("queries") == 1L,
        s"INTO OUTFILE must charge once, got ${usage("queries")}")
      // PARALLEL WITH: N legs, ONE statement, ONE charge
      ch("SET user = 'quota_once_u'")
      ch(s"INSERT INTO $t VALUES (2) PARALLEL WITH INSERT INTO $t VALUES (3)")
      ch("SET user = 'default'")
      assert(usage("queries") == 2L,
        s"PARALLEL WITH must charge once, total ${usage("queries")}")
    } finally {
      ch("SET user = 'default'")
      scala.util.Try(ch("DROP QUOTA IF EXISTS q_once"))
      scala.util.Try(ch("DROP USER IF EXISTS quota_once_u"))
      scala.util.Try(ch(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("CREATE QUOTA KEYED BY non-user keys rejects loudly " +
      "(documented deviation), unknown key names error") {
    intercept[IllegalArgumentException] {
      ch("CREATE QUOTA q_keyed KEYED BY ip_address FOR INTERVAL 1 hour " +
        "MAX queries = 5 TO ALL")
    }
    intercept[IllegalArgumentException] {
      ch("CREATE QUOTA q_keyed KEYED BY banana FOR INTERVAL 1 hour " +
        "MAX queries = 5 TO ALL")
    }
    // the supported key still works
    ch("CREATE QUOTA q_keyed KEYED BY user_name FOR INTERVAL 1 hour " +
      "MAX queries = 5 TO ALL")
    scala.util.Try(ch("DROP QUOTA IF EXISTS q_keyed"))
  }

  test("multi-word dialect keywords tolerate whitespace runs " +
      "(GROUP  BY … WITH\\nTOTALS, QUALIFY … ORDER  BY)") {
    Tables.register(spark, sf)
    val totals = ch(
      "SELECT n_regionkey, count() AS c FROM nation " +
        "GROUP  BY n_regionkey WITH\n  TOTALS").collect()
    assert(totals.length == 6) // 5 groups + the totals row
    assert(totals.exists(r => r.isNullAt(0) && r.getLong(1) == 25L))
    val q = ch(
      "SELECT n_regionkey, row_number() OVER " +
        "(PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation " +
        "QUALIFY rn = 1 ORDER  BY\nn_regionkey").collect()
    assert(q.length == 5 &&
      q.map(_.getAs[Number](0).longValue).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("durable mutation on a NULL-keyed partition: swap commits, no " +
      "sentinel-string partition spec reaches the catalog") {
    val t = "graft_null_part_t"
    scratch(t)
    val s = spark
    import s.implicits._
    Seq((Some("a"), 1L), (Some("a"), 2L), (None: Option[String], 3L),
      (None: Option[String], 4L))
      .toDF("k", "v").write.partitionBy("k").saveAsTable(t)
    ch(s"ALTER TABLE $t UPDATE v = v + 100 WHERE v >= 3")
    val rows = spark.table(t).collect()
    assert(rows.filter(_.isNullAt(1)).map(_.getLong(0)).sorted.toSeq ==
      Seq(103L, 104L))
    assert(rows.filter(!_.isNullAt(1)).map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    // a second mutation that EMPTIES the null partition exercises the
    // DROP-side skip (the old code issued `k = '__HIVE_DEFAULT_…'` DDL)
    ch(s"ALTER TABLE $t DELETE WHERE v >= 100")
    val left = spark.table(t).collect()
    assert(left.length == 2 && left.forall(r => r.getString(1) == "a"))
    scratch(t)
  }
}
