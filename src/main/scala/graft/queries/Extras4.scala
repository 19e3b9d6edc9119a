package graft.queries

import graft.{Q, QueryPack}

/** Fourth gap-closing pack: interval aggregates (intervalLengthSum,
  * maxIntersections), timeseries aggregates (deltaSumTimestamp,
  * boundingRatio, sparkbar) and the -ArgMax combinator.
  *
  * Reference anchors: src/AggregateFunctions/
  * AggregateFunctionIntervalLengthSum.cpp, ...MaxIntersections.cpp,
  * ...DeltaSumTimestamp.cpp, ...BoundingRatio.cpp, ...Sparkbar.cpp,
  * Combinators/AggregateFunctionArgMinMax.cpp.
  *
  * Scale design: every operator is a per-key PARTITIONED window or plain
  * aggregate — the sweep-line forms (interval union, max overlap) order
  * only within a key's own intervals, never globally.
  */
object Extras4 extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // intervalLengthSum: length of the UNION of [ship, ship + 1..20 days)
    // intervals per supplier — sweep line: sort by start within the key,
    // each interval contributes max(0, end - max(start, running max of
    // previous ends)). (The synthetic lineitem ships no l_receiptdate, so
    // the interval end derives deterministically from l_orderkey — the
    // sweep-line operator under test is unchanged.)
    Q.sparkSql("q_agg_interval_length_sum", """
      WITH iv AS (SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
                    DATE_ADD(CAST(l_shipdate AS DATE),
                             CAST(l_orderkey % 20 + 1 AS INT)) AS e
                  FROM lineitem),
      w AS (SELECT k, s, e,
              MAX(e) OVER (PARTITION BY k ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM iv)
      SELECT k,
        CAST(SUM(GREATEST(0, DATEDIFF(e, GREATEST(s, COALESCE(pmax, s))))) AS BIGINT)
          AS union_days
      FROM w
      GROUP BY k
      ORDER BY k""",
      """
      WITH iv AS (SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
                    CAST(l_shipdate AS DATE) + CAST(l_orderkey % 20 + 1 AS INT) AS e
                  FROM lineitem),
      w AS (SELECT k, s, e,
              MAX(e) OVER (PARTITION BY k ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM iv)
      SELECT k,
        CAST(SUM(GREATEST(0, DATE_DIFF('day', GREATEST(s, COALESCE(pmax, s)), e))) AS BIGINT)
          AS union_days
      FROM w
      GROUP BY k
      ORDER BY k"""),

    // maxIntersections: the maximum number of simultaneously open
    // [ship, ship + 1..20 days) intervals per supplier — +1/-1 deltas
    // aggregated per date, running sum, max. Same derived end as
    // q_agg_interval_length_sum.
    Q.sparkSql("q_agg_max_intersections", """
      WITH pts AS (
        SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS t, 1 AS d FROM lineitem
        UNION ALL
        SELECT l_suppkey AS k,
          DATE_ADD(CAST(l_shipdate AS DATE), CAST(l_orderkey % 20 + 1 AS INT)) AS t,
          -1 AS d FROM lineitem),
      c AS (SELECT k, t, SUM(d) AS dsum FROM pts GROUP BY k, t),
      r AS (SELECT k,
              SUM(dsum) OVER (PARTITION BY k ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
            FROM c)
      SELECT k, CAST(MAX(run) AS BIGINT) AS max_open
      FROM r
      GROUP BY k
      ORDER BY k""",
      """
      WITH pts AS (
        SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS t, 1 AS d FROM lineitem
        UNION ALL
        SELECT l_suppkey AS k,
          CAST(l_shipdate AS DATE) + CAST(l_orderkey % 20 + 1 AS INT) AS t,
          -1 AS d FROM lineitem),
      c AS (SELECT k, t, SUM(d) AS dsum FROM pts GROUP BY k, t),
      r AS (SELECT k,
              SUM(dsum) OVER (PARTITION BY k ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
            FROM c)
      SELECT k, CAST(MAX(run) AS BIGINT) AS max_open
      FROM r
      GROUP BY k
      ORDER BY k"""),

    // deltaSumTimestamp: sum of POSITIVE deltas between consecutive values
    // in (ts, event_id) order per user — fixed-point so the sum is exact.
    Q.sparkSql("q_agg_delta_sum_timestamp", """
      WITH e AS (SELECT user_id, UNIX_MICROS(ts) AS t, event_id,
                   CAST(ROUND(value * 10000) AS BIGINT) AS v
                 FROM events),
      d AS (SELECT user_id,
              v - LAG(v) OVER (PARTITION BY user_id ORDER BY t, event_id) AS dv
            FROM e)
      SELECT user_id,
        CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS DOUBLE) / 10000.0 AS delta_sum
      FROM d
      GROUP BY user_id
      ORDER BY user_id""",
      """
      WITH e AS (SELECT user_id, EPOCH_US(ts) AS t, event_id,
                   CAST(ROUND(value * 10000) AS BIGINT) AS v
                 FROM events),
      d AS (SELECT user_id,
              v - LAG(v) OVER (PARTITION BY user_id ORDER BY t, event_id) AS dv
            FROM e)
      SELECT user_id,
        CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS DOUBLE) / 10000.0 AS delta_sum
      FROM d
      GROUP BY user_id
      ORDER BY user_id"""),

    // boundingRatio: slope between the first and last point of each user's
    // (ts, value) series — value delta per SECOND, exact fixed-point values.
    Q.sparkSql("q_agg_bounding_ratio", """
      WITH e AS (SELECT user_id, UNIX_MICROS(ts) AS t, event_id,
                   CAST(ROUND(value * 10000) AS BIGINT) AS v
                 FROM events),
      r AS (SELECT user_id,
              FIRST_VALUE(v) OVER w AS v0, LAST_VALUE(v) OVER w AS v1,
              FIRST_VALUE(t) OVER w AS t0, LAST_VALUE(t) OVER w AS t1
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT DISTINCT user_id,
        CASE WHEN t1 > t0 THEN
          ROUND(CAST(v1 - v0 AS DOUBLE) / 10000.0
                / (CAST(t1 - t0 AS DOUBLE) / 1000000.0), 8)
        END AS ratio_per_sec
      FROM r
      ORDER BY user_id""",
      """
      WITH e AS (SELECT user_id, EPOCH_US(ts) AS t, event_id,
                   CAST(ROUND(value * 10000) AS BIGINT) AS v
                 FROM events),
      r AS (SELECT user_id,
              FIRST_VALUE(v) OVER w AS v0, LAST_VALUE(v) OVER w AS v1,
              FIRST_VALUE(t) OVER w AS t0, LAST_VALUE(t) OVER w AS t1
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT DISTINCT user_id,
        CASE WHEN t1 > t0 THEN
          ROUND(CAST(v1 - v0 AS DOUBLE) / 10000.0
                / (CAST(t1 - t0 AS DOUBLE) / 1000000.0), 8)
        END AS ratio_per_sec
      FROM r
      ORDER BY user_id"""),

    // sparkbar(12): unicode bar chart of monthly order counts — levels are
    // integer math (1..8 scaled min..max), glyphs from a literal array so
    // both engines emit identical strings.
    Q.sparkSql("q_agg_sparkbar", """
      WITH m AS (SELECT (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1 AS mo,
                   COUNT(*) AS c
                 FROM orders WHERE YEAR(o_orderdate) = 1995
                 GROUP BY (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1),
      s AS (SELECT mo, c, MIN(c) OVER () AS mn, MAX(c) OVER () AS mx FROM m),
      l AS (SELECT mo,
              CASE WHEN mx > mn
                THEN 1 + CAST(FLOOR(7.0 * (c - mn) / (mx - mn)) AS INT)
                ELSE 8 END AS lvl
            FROM s)
      SELECT ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(mo, lvl))),
        x -> ELEMENT_AT(ARRAY('▁','▂','▃','▄','▅','▆','▇','█'), x.lvl)), '') AS bar
      FROM l""",
      """
      WITH m AS (SELECT (EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
                   + EXTRACT(MONTH FROM o_orderdate) - 1 AS mo,
                   COUNT(*) AS c
                 FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
                 GROUP BY 1),
      s AS (SELECT mo, c, MIN(c) OVER () AS mn, MAX(c) OVER () AS mx FROM m),
      l AS (SELECT mo,
              CASE WHEN mx > mn
                THEN 1 + CAST(FLOOR(7.0 * (c - mn) / (mx - mn)) AS INT)
                ELSE 8 END AS lvl
            FROM s)
      SELECT STRING_AGG((['▁','▂','▃','▄','▅','▆','▇','█'])[lvl], '' ORDER BY mo) AS bar
      FROM l"""),

    // General -Map combinator (Combinators/AggregateFunctionMap.cpp) with
    // an aggregate beyond sum/min/max: avgMap — per-key averages emitted
    // as key-sorted entries (CSV-serialized; exact cent sums / counts).
    Q.sparkSql("q_agg_avg_map", """
      WITH k AS (SELECT user_id, event_type,
                   CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                     / 10000.0 / COUNT(*) AS avg_v
                 FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(event_type, avg_v))),
          s -> CONCAT(s.event_type, ':', CAST(CAST(ROUND(s.avg_v, 6) AS DECIMAL(18,6)) AS STRING))), ',')
          AS avg_map
      FROM k
      GROUP BY user_id
      ORDER BY user_id""",
      """
      WITH k AS (SELECT user_id, event_type,
                   CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                     / 10000.0 / COUNT(*) AS avg_v
                 FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        STRING_AGG(event_type || ':'
            || CAST(CAST(ROUND(avg_v, 6) AS DECIMAL(18,6)) AS VARCHAR),
          ',' ORDER BY event_type) AS avg_map
      FROM k
      GROUP BY user_id
      ORDER BY user_id"""),

    // -ArgMax combinator (Combinators/AggregateFunctionArgMinMax.cpp):
    // sumArgMax(l_quantity, l_shipdate) — the aggregate restricted to rows
    // where the arg column is maximal within the group.
    Q.shared("q_agg_combinator_argmax", """
      SELECT l_orderkey,
        CAST(SUM(CASE WHEN l_shipdate = mx
                 THEN CAST(ROUND(l_quantity * 100) AS BIGINT) END) AS BIGINT)
          AS sum_qty_cents_at_latest
      FROM (SELECT l_orderkey, l_quantity, l_shipdate,
              MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS mx
            FROM lineitem) t
      GROUP BY l_orderkey
      ORDER BY l_orderkey""")
  )
}
