package graft.queries

import graft.{Q, QueryPack}

/** Third gap-closing pack (VERDICT round-1 gap #4/#5): sequenceNextNode,
  * groupArraySorted / groupArrayMovingSum / groupArrayInsertAt,
  * topKWeighted. All are window/aggregate compositions — one shuffle on
  * the group key, partial aggregation map-side, partitioned (never global)
  * windows. Array-valued results are serialized to CSV strings for the
  * driver harness (see AggFunctions).
  */
object Extras3 extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // sequenceNextNode(forward, first_match) (reference:
    // src/AggregateFunctions/AggregateFunctionSequenceNextNode.cpp): the
    // event that FOLLOWS the first matched event ('signup') per user, in
    // (ts, event_id) order.
    Q.sparkSql("q_agg_sequence_next_node", """
      WITH e AS (SELECT user_id, UNIX_MICROS(ts) AS t, event_id, event_type
                 FROM events),
      f AS (SELECT user_id, MIN(t) AS t0 FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      nxt AS (SELECT e.user_id, e.event_type,
                ROW_NUMBER() OVER (PARTITION BY e.user_id
                                   ORDER BY e.t, e.event_id) AS rn
              FROM e JOIN f ON e.user_id = f.user_id AND e.t > f.t0)
      SELECT user_id, event_type AS next_node
      FROM nxt WHERE rn = 1
      ORDER BY user_id""",
      """
      WITH e AS (SELECT user_id, EPOCH_US(ts) AS t, event_id, event_type
                 FROM events),
      f AS (SELECT user_id, MIN(t) AS t0 FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      nxt AS (SELECT e.user_id, e.event_type,
                ROW_NUMBER() OVER (PARTITION BY e.user_id
                                   ORDER BY e.t, e.event_id) AS rn
              FROM e JOIN f ON e.user_id = f.user_id AND e.t > f.t0)
      SELECT user_id, event_type AS next_node
      FROM nxt WHERE rn = 1
      ORDER BY user_id"""),

    // groupArraySorted(5) (reference: registered next to
    // AggregateFunctionGroupArray.cpp family): the 5 smallest values per
    // group, sorted — emitted as exact cent integers, CSV-serialized.
    Q.sparkSql("q_agg_group_array_sorted", """
      SELECT o_orderpriority,
        ARRAY_JOIN(TRANSFORM(
          SLICE(ARRAY_SORT(COLLECT_LIST(CAST(ROUND(o_totalprice * 100) AS BIGINT))), 1, 5),
          x -> CAST(x AS STRING)), ',') AS low5_cents
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
      """
      SELECT o_orderpriority,
        ARRAY_TO_STRING((LIST(c ORDER BY c))[1:5], ',') AS low5_cents
      FROM (SELECT o_orderpriority,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),

    // groupArrayMovingSum(3) (reference:
    // src/AggregateFunctions/AggregateFunctionGroupArrayMoving.cpp): the
    // trailing-3 moving sum over each group's ordered series (monthly
    // quantity per returnflag), emitted as the CH array — CSV of exact
    // DECIMAL window sums. Window is PARTITIONED by flag; the series per
    // group is months, tiny.
    Q.sparkSql("q_agg_group_array_moving", """
      WITH m AS (SELECT l_returnflag, DATE_TRUNC('month', l_shipdate) AS mo,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
                 FROM lineitem GROUP BY l_returnflag, DATE_TRUNC('month', l_shipdate)),
      w AS (SELECT l_returnflag, mo,
              SUM(q) OVER (PARTITION BY l_returnflag ORDER BY mo
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms
            FROM m)
      SELECT l_returnflag,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(mo, ms))),
          s -> CAST(s.ms AS STRING)), ',') AS moving_sum3
      FROM w
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
      """
      WITH m AS (SELECT l_returnflag, DATE_TRUNC('month', l_shipdate) AS mo,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
                 FROM lineitem GROUP BY l_returnflag, DATE_TRUNC('month', l_shipdate)),
      w AS (SELECT l_returnflag, mo,
              SUM(q) OVER (PARTITION BY l_returnflag ORDER BY mo
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms
            FROM m)
      SELECT l_returnflag,
        STRING_AGG(CAST(ms AS VARCHAR), ',' ORDER BY mo) AS moving_sum3
      FROM w
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),

    // groupArrayInsertAt (reference:
    // src/AggregateFunctions/AggregateFunctionGroupArrayInsertAt.cpp):
    // values placed at caller-given positions (priority digit 1..5),
    // absent slots default-filled with 0.
    Q.sparkSql("q_agg_group_array_insert_at", """
      WITH c AS (SELECT o_orderstatus,
                   CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS pos,
                   COUNT(*) AS cnt
                 FROM orders GROUP BY o_orderstatus, SUBSTRING(o_orderpriority, 1, 1)),
      m AS (SELECT o_orderstatus,
              MAP_FROM_ENTRIES(COLLECT_LIST(STRUCT(pos, cnt))) AS mp
            FROM c GROUP BY o_orderstatus)
      SELECT o_orderstatus,
        ARRAY_JOIN(TRANSFORM(SEQUENCE(1, 5),
          i -> CAST(COALESCE(ELEMENT_AT(mp, i), 0) AS STRING)), ',') AS by_priority
      FROM m
      ORDER BY o_orderstatus""",
      """
      SELECT o_orderstatus,
        ARRAY_TO_STRING([
          COUNT(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '1' THEN 1 END),
          COUNT(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '2' THEN 1 END),
          COUNT(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '3' THEN 1 END),
          COUNT(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '4' THEN 1 END),
          COUNT(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '5' THEN 1 END)], ',') AS by_priority
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),

    // topKWeighted(3) (reference: AggregateFunctionTopK.cpp:50 weighted
    // registration): top event types by TOTAL VALUE (fixed-point weight),
    // deterministic tie-break (weight desc, value asc).
    Q.sparkSql("q_agg_topk_weighted", """
      WITH w AS (SELECT user_id, event_type,
                   SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS wt
                 FROM events GROUP BY user_id, event_type),
      r AS (SELECT user_id, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY wt DESC, event_type) AS rn
            FROM w)
      SELECT user_id,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(rn, event_type))),
          s -> s.event_type), ',') AS top_types
      FROM r WHERE rn <= 3
      GROUP BY user_id
      ORDER BY user_id""",
      """
      WITH w AS (SELECT user_id, event_type,
                   SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS wt
                 FROM events GROUP BY user_id, event_type),
      r AS (SELECT user_id, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY wt DESC, event_type) AS rn
            FROM w)
      SELECT user_id,
        STRING_AGG(event_type, ',' ORDER BY rn) AS top_types
      FROM r WHERE rn <= 3
      GROUP BY user_id
      ORDER BY user_id""")
  )
}
