package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.{JoinOps, MergeTreeViews}
import org.apache.spark.sql.functions._

/** ASOF / PASTE / ANY joins, dictionary lookup, and MergeTree engine-family
  * FINAL semantics (SURVEY §2.3, §2.1 engine variants).
  */
object JoinExtras extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // ASOF LEFT JOIN events→orders: latest order at-or-before each event
    // (reference: JoinStrictness::Asof, src/Core/Joins.h:44; inequality
    // catalog :78). One shuffle union-window plan.
    Q.df("q_asof_join", """
      WITH m AS (
        SELECT user_id, event_id,
          (SELECT MAX(o_orderdate) FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate <= e.ts) AS asof_date
        FROM events e)
      SELECT m.user_id, m.event_id, m.asof_date,
        (SELECT MAX(o_orderkey) FROM orders
         WHERE o_custkey = m.user_id AND o_orderdate = m.asof_date) AS asof_order
      FROM m
      ORDER BY user_id, event_id""") { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
      // Right side deduped to the max orderkey per (custkey, orderdate) so
      // the ASOF tie-break is total.
      // Round-18 measured, left alone: fanOutIfTiny keyed on the GROUP BY
      // keys (exchange-reuse form) REGRESSED 0.83→0.97s min across two
      // calibrated A/B pairs — (custkey, orderdate) is near-unique, so the
      // map-side partial aggregate saves nothing and the fan-out only adds
      // exchange overhead to a 150k-row scan whose fused partial agg is
      // ~50ms of one task.
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumn("asofdate", col("o_orderdate"))
      JoinOps.asofJoinBackward(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = unix_micros(col("ts")),
        rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
        rightPayload = Seq("asofdate", "o_orderkey"),
        rightTieBreak = col("o_orderkey"))
        .select(col("user_id"), col("event_id"),
          col("asof_asofdate").as("asof_date"),
          col("asof_o_orderkey").as("asof_order"))
        .orderBy("user_id", "event_id")
    },

    // ASOF forward-inclusive (src/Core/Joins.h:78 GreaterOrEquals):
    // EARLIEST order at-or-after each event — the other direction of the
    // inequality matrix, same single-shuffle plan scanned descending.
    Q.df("q_asof_forward", """
      WITH m AS (
        SELECT user_id, event_id,
          (SELECT MIN(o_orderdate) FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate >= e.ts) AS asof_date
        FROM events e)
      SELECT m.user_id, m.event_id, m.asof_date,
        (SELECT MAX(o_orderkey) FROM orders
         WHERE o_custkey = m.user_id AND o_orderdate = m.asof_date) AS asof_order
      FROM m
      ORDER BY user_id, event_id""") { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumn("asofdate", col("o_orderdate"))
      JoinOps.asofJoin(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = unix_micros(col("ts")),
        rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
        rightPayload = Seq("asofdate", "o_orderkey"),
        rightTieBreak = col("o_orderkey"),
        op = ">=")
        .select(col("user_id"), col("event_id"),
          col("asof_asofdate").as("asof_date"),
          col("asof_o_orderkey").as("asof_order"))
        .orderBy("user_id", "event_id")
    },

    // ASOF backward-strict (src/Core/Joins.h:78 Less): latest order
    // STRICTLY before each event — equal timestamps do not match.
    Q.df("q_asof_strict", """
      WITH m AS (
        SELECT user_id, event_id,
          (SELECT MAX(o_orderdate) FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate < e.ts) AS asof_date
        FROM events e)
      SELECT m.user_id, m.event_id, m.asof_date,
        (SELECT MAX(o_orderkey) FROM orders
         WHERE o_custkey = m.user_id AND o_orderdate = m.asof_date) AS asof_order
      FROM m
      ORDER BY user_id, event_id""") { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumn("asofdate", col("o_orderdate"))
      JoinOps.asofJoin(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = unix_micros(col("ts")),
        rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
        rightPayload = Seq("asofdate", "o_orderkey"),
        rightTieBreak = col("o_orderkey"),
        op = "<")
        .select(col("user_id"), col("event_id"),
          col("asof_asofdate").as("asof_date"),
          col("asof_o_orderkey").as("asof_order"))
        .orderBy("user_id", "event_id")
    },

    // ASOF with tolerance (RowRefs.h:166-173 sorted nearest lookup + max
    // gap): backward match as q_asof_join, but a match further than 7 days
    // behind the event is nulled out. Same one-shuffle union-window plan;
    // the tolerance is a post-window predicate.
    Q.df("q_asof_tolerance", """
      WITH m AS (
        SELECT user_id, event_id,
          (SELECT MAX(o_orderdate) FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate <= e.ts) AS raw_date,
          EPOCH_US(e.ts) AS ets
        FROM events e),
      t AS (
        SELECT user_id, event_id,
          CASE WHEN raw_date IS NOT NULL
                AND ets - EPOCH_US(CAST(raw_date AS TIMESTAMP)) <= 604800000000
               THEN raw_date END AS asof_date
        FROM m)
      SELECT t.user_id, t.event_id, t.asof_date,
        (SELECT MAX(o_orderkey) FROM orders
         WHERE o_custkey = t.user_id AND o_orderdate = t.asof_date) AS asof_order
      FROM t
      ORDER BY user_id, event_id""") { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumn("asofdate", col("o_orderdate"))
      JoinOps.asofJoinTolerance(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = unix_micros(col("ts")),
        rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
        rightPayload = Seq("asofdate", "o_orderkey"),
        rightTieBreak = col("o_orderkey"),
        tolerance = 604800000000L) // 7 days in µs
        .select(col("user_id"), col("event_id"),
          col("asof_asofdate").as("asof_date"),
          col("asof_o_orderkey").as("asof_order"))
        .orderBy("user_id", "event_id")
    },

    // ANY RIGHT JOIN (src/Core/Joins.h:44 RightAny): every order exactly
    // once, matched to its deterministic-first lineitem — the LEFT side
    // dedups, so the join never amplifies the right side. The pick is
    // total on (linenumber, quantity): the synthetic corpus has duplicate
    // linenumbers per order, so a bare-linenumber pick would be
    // engine-nondeterministic.
    Q.df("q_any_right_join", """
      WITH d AS (
        SELECT l_orderkey, l_linenumber, l_quantity,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey
                             ORDER BY l_linenumber, l_quantity) AS rn
        FROM lineitem)
      SELECT o_orderkey, d.l_linenumber AS first_line,
             d.l_quantity AS first_qty
      FROM orders LEFT JOIN (SELECT * FROM d WHERE rn = 1) d
        ON o_orderkey = d.l_orderkey
      ORDER BY o_orderkey""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      JoinOps.anyRightJoin(li,
        Tables.load(s, dir, "orders").select("o_orderkey"),
        "o_orderkey", struct(col("l_linenumber"), col("l_quantity")))
        .select(col("o_orderkey"), col("l_linenumber").as("first_line"),
          col("l_quantity").as("first_qty"))
        .orderBy("o_orderkey")
    },

    // PASTE JOIN (positional zip) of the region and nation tables in
    // name order (reference: PasteJoinTransform) — inner-zip of the first
    // min(n,m) rows.
    Q.df("q_paste_join", """
      WITH l AS (SELECT r_name, ROW_NUMBER() OVER (ORDER BY r_name) AS i FROM region),
           r AS (SELECT n_name, ROW_NUMBER() OVER (ORDER BY n_name) AS i FROM nation)
      SELECT l.r_name, r.n_name FROM l JOIN r USING (i)
      ORDER BY r_name, n_name""") { (s, dir) =>
      JoinOps.pasteJoin(
        Tables.load(s, dir, "region").select("r_name").orderBy("r_name"),
        Tables.load(s, dir, "nation").select("n_name").orderBy("n_name"))
        .orderBy("r_name", "n_name")
    },

    // ANY LEFT JOIN: exactly one (deterministic first) order per customer
    // (reference: JoinStrictness::Any — first match only).
    Q.df("q_any_join", """
      SELECT c_custkey, first_order FROM customer
      LEFT JOIN (
        SELECT o_custkey, MIN(o_orderkey) AS first_order
        FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
      ORDER BY c_custkey""") { (s, dir) =>
      JoinOps.anyLeftJoin(
        Tables.load(s, dir, "customer").select(col("c_custkey").as("o_custkey")),
        Tables.load(s, dir, "orders").select(col("o_custkey"), col("o_orderkey")),
        "o_custkey", col("o_orderkey"))
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey").as("first_order"))
        .orderBy("c_custkey")
    },

    // dictGet (FunctionsExternalDictionaries.h): broadcast dictionary probe
    // supplier→nation-name with a default for misses.
    Q.df("q_dict_get", """
      SELECT s_suppkey, COALESCE(n_name, 'UNKNOWN') AS n_name
      FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
      ORDER BY s_suppkey""") { (s, dir) =>
      JoinOps.dictGet(
        Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        Tables.load(s, dir, "nation"),
        factKey = "s_nationkey", dictKey = "n_nationkey",
        attr = "n_name", default = lit("UNKNOWN"))
        .select("s_suppkey", "n_name")
        .orderBy("s_suppkey")
    },

    // ReplacingMergeTree FINAL (ReplacingSortedAlgorithm): latest order per
    // customer, version = (o_orderdate, o_orderkey).
    Q.df("q_final_replacing", """
      SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey""") { (s, dir) =>
      MergeTreeViews.replacingFinal(
        Tables.load(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate"),
        keys = Seq("o_custkey"),
        version = Seq(col("o_orderdate"), col("o_orderkey")))
        .orderBy("o_custkey")
    },

    // SummingMergeTree FINAL (SummingSortedAlgorithm): per-(order,part) key
    // the quantity/price metrics collapse to sums.
    Q.df("q_final_summing", """
      SELECT l_orderkey, l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
      FROM lineitem
      GROUP BY l_orderkey, l_partkey
      ORDER BY l_orderkey, l_partkey""") { (s, dir) =>
      MergeTreeViews.summingFinal(
        Tables.load(s, dir, "lineitem"),
        keys = Seq("l_orderkey", "l_partkey"),
        sums = Seq(
          "qty" -> sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
          "price" -> sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")))
        .orderBy("l_orderkey", "l_partkey")
    },

    // CollapsingMergeTree FINAL (CollapsingSortedAlgorithm): returnflag 'R'
    // rows act as sign=-1 cancels; keys with positive net survive with
    // sign-weighted quantity.
    Q.df("q_final_collapsing", """
      SELECT l_orderkey,
        CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END
                 * 100 AS BIGINT)) AS BIGINT) AS net_qty_cents
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) > 0
      ORDER BY l_orderkey""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val sign = when(col("l_returnflag") === "R", -1L).otherwise(1L)
      MergeTreeViews.collapsingFinal(
          li.withColumn("qty_cents", (col("l_quantity") * 100).cast("long")),
          keys = Seq("l_orderkey"), sign = sign,
          metrics = Seq("net_qty_cents" -> col("qty_cents")))
        .select(col("l_orderkey"), col("net_qty_cents"))
        .orderBy("l_orderkey")
    },

    // VersionedCollapsingMergeTree FINAL (VersionedCollapsingSortedAlgorithm,
    // registerStorageMergeTree.cpp:924-942): 'R' lineitems cancel the state
    // of the SAME version (l_linenumber) only; the survivor per order is
    // the highest surviving version.
    Q.df("q_final_versioned_collapsing", """
      SELECT l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey
                             ORDER BY l_linenumber DESC) AS rn
        FROM (SELECT l_orderkey, l_linenumber,
                SUM(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS net
              FROM lineitem
              GROUP BY l_orderkey, l_linenumber
              HAVING SUM(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) > 0) s) t
      WHERE rn = 1
      ORDER BY l_orderkey""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val sign = when(col("l_returnflag") === "R", -1L).otherwise(1L)
      MergeTreeViews.versionedCollapsingFinal(
          li.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")),
          keys = Seq("l_orderkey"), version = "l_linenumber", sign = sign)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey")
    },

    // GraphiteMergeTree rollup (GraphiteRollupSortedAlgorithm.cpp,
    // Graphite.h rollup rules): events as the metrics table — path =
    // event_type, version = event_id. Rules: click/view average hourly for
    // the last 14 days and daily beyond (two-step retention); error keeps
    // raw timestamps with max; everything else sums 6-hourly. The pinned
    // `now` (2024-01-31) makes age deterministic. Oracle recomputes the
    // schedule with CASE arithmetic on the same fixed-point sums.
    Q.df("q_final_graphite", """
      WITH dd AS (
        SELECT event_type, ts, value, event_id,
          ROW_NUMBER() OVER (PARTITION BY event_type, ts ORDER BY event_id DESC) AS rn
        FROM events),
      c AS (SELECT event_type, ts, value,
        CASE WHEN event_type IN ('click','view') THEN 0
             WHEN event_type = 'error' THEN 1 ELSE 2 END AS pi,
        1706659200 - CAST(FLOOR(EPOCH_US(ts) / 1000000.0) AS BIGINT) AS age
        FROM dd WHERE rn = 1),
      p AS (SELECT *,
        CASE WHEN pi = 0 THEN (CASE WHEN age >= 1209600 THEN 86400 ELSE 3600 END)
             WHEN pi = 1 THEN NULL
             ELSE 21600 END AS prec
        FROM c),
      r AS (SELECT event_type, pi,
        CASE WHEN prec IS NULL THEN CAST(ts AS TIMESTAMP)
             ELSE MAKE_TIMESTAMP(CAST(FLOOR(EPOCH_US(ts) / (prec * 1000000.0)) AS BIGINT) * prec * 1000000) END AS t,
        CAST(ROUND(value * 1000000) AS BIGINT) AS vfix, value
        FROM p),
      g AS (SELECT event_type, pi, t, SUM(vfix) AS s, COUNT(*) AS n,
             MIN(value) AS mn, MAX(value) AS mx
        FROM r GROUP BY 1, 2, 3)
      SELECT event_type, t AS ts,
        ROUND(CASE WHEN pi = 0 THEN CAST(s AS DOUBLE)/CAST(n AS DOUBLE)/1000000.0
                   WHEN pi = 1 THEN mx
                   ELSE CAST(s AS DOUBLE)/1000000.0 END, 6) AS value
      FROM g ORDER BY event_type, t""") { (s, dir) =>
      import MergeTreeViews.{GraphitePattern, GraphiteRetention}
      MergeTreeViews.graphiteFinal(
          Tables.load(s, dir, "events")
            .select("event_type", "ts", "value", "event_id"),
          path = "event_type", time = "ts", value = "value",
          version = "event_id",
          patterns = Seq(
            GraphitePattern(Some("^(click|view)$"), "avg",
              Seq(GraphiteRetention(0, 3600), GraphiteRetention(1209600, 86400))),
            GraphitePattern(Some("^error$"), "max", Nil),
            GraphitePattern(None, "sum", Seq(GraphiteRetention(0, 21600)))),
          nowEpochSec = 1706659200L)
        .orderBy("event_type", "ts")
    },

    // dictHas (FunctionsExternalDictionaries.h dictHas) — membership probe
    // against a broadcast dictionary; dictGetOrDefault is the default arm
    // of the existing q_dict_get.
    Q.df("q_dict_has", """
      SELECT c_custkey,
        (c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)) AS in_region1
      FROM customer
      ORDER BY c_custkey""") { (s, dir) =>
      val dict = Tables.load(s, dir, "nation")
        .filter(col("n_regionkey") === 1).select(col("n_nationkey"))
      Tables.load(s, dir, "customer")
        .join(broadcast(dict.withColumn("__hit", lit(true))),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), coalesce(col("__hit"), lit(false)).as("in_region1"))
        .orderBy("c_custkey")
    },

    // dictGetHierarchy + dictIsIn (FunctionsExternalDictionaries.h): a
    // 3-level parent-keyed dictionary (nation → region → root) built from
    // the corpus; the ancestor closure is computed by self-joining the
    // SMALL dict only, then facts probe the finished closure by broadcast.
    // The oracle recomputes the chain with a recursive CTE — exact SQL.
    Q.df("q_dict_hierarchy", """
      WITH RECURSIVE d AS (
        SELECT n_nationkey AS id, 100 + n_regionkey AS parent FROM nation
        UNION ALL SELECT 100 + r_regionkey, 1000 FROM region
        UNION ALL SELECT 1000, NULL),
      h AS (
        SELECT id AS k, [id] AS path, parent AS nxt FROM d
        UNION ALL
        SELECT h.k, list_append(h.path, h.nxt), d2.parent
        FROM h JOIN d d2 ON h.nxt = d2.id),
      c AS (SELECT k, path FROM h WHERE nxt IS NULL)
      SELECT n.n_nationkey,
        array_to_string(c.path, '>') AS hier,
        list_contains(c.path, 101) AS in_region1,
        list_contains(c.path, 1000) AS under_root
      FROM nation n JOIN c ON n.n_nationkey = c.k
      ORDER BY n.n_nationkey""") { (s, dir) =>
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      val dict = nation.select(col("n_nationkey").cast("long").as("id"),
          (col("n_regionkey") + 100).cast("long").as("parent"))
        .unionByName(region.select(
          (col("r_regionkey") + 100).cast("long").as("id"),
          lit(1000L).as("parent")))
        .unionByName(region.sparkSession.range(1000, 1001).toDF("id")
          .select(col("id"), lit(null).cast("long").as("parent")))
      val withH = JoinOps.dictGetHierarchy(
        nation.select(col("n_nationkey")), dict,
        factKey = "n_nationkey", id = "id", parent = "parent", out = "__h")
      withH.select(col("n_nationkey"),
          array_join(transform(col("__h"), _.cast("string")), ">").as("hier"),
          array_contains(col("__h"), lit(101L)).as("in_region1"),
          array_contains(col("__h"), lit(1000L)).as("under_root"))
        .orderBy("n_nationkey")
    },

    // Bloom semi-join reduction (operators/BloomOps): lineitem
    // pre-filtered by a distributed-built bloom over the urgent orders'
    // keys before the exact semi join — the runtime-filter pattern that
    // shrinks the fact shuffle BEFORE it happens. Exactness is the
    // contract (no false negatives; positives re-checked), so the oracle
    // is the plain semi join.
    Q.df("q_bloom_semi_join", """
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')""") { (s, dir) =>
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.BloomOps.bloomSemiJoin(
          Tables.load(s, dir, "lineitem"), urgent, "l_orderkey", "o_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    },

    // Salted skew join (operators/ScaleOps.saltedJoin): a derived key
    // where ~80% of lineitem lands on one hot value — the reducer-melter
    // at 1000 executors. Salting splits each key into 8 sub-keys (dim
    // replicated 8x, fact salted by row id), so the hot key spreads over
    // 8 reducers; the RESULT is identical to the plain join, which is
    // exactly what the oracle states.
    Q.df("q_salted_join", """
      WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                             ELSE l_orderkey % 10 END AS skew_key,
                        l_quantity
                 FROM lineitem),
      d AS (SELECT DISTINCT skew_key, 'g' || CAST(skew_key AS VARCHAR) AS label
            FROM f)
      SELECT d.label, COUNT(*) AS n,
        CAST(SUM(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM f JOIN d ON f.skew_key = d.skew_key
      GROUP BY d.label ORDER BY d.label""") { (s, dir) =>
      val fact = Tables.load(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 10 < 8, lit(0L))
          .otherwise(col("l_orderkey") % 10).as("skew_key"),
          col("l_quantity"))
      val dim = fact.select(col("skew_key")).distinct()
        .withColumn("label", concat(lit("g"), col("skew_key").cast("string")))
      graft.operators.ScaleOps.saltedJoin(fact, dim, "skew_key", 8)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("label")
    }
  )
}
