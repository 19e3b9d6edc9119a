package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Second gap-closing pack: -ForEach/-Resample combinators, min/maxMap,
  * rank statistics, geo distance, IP codec, format strings.
  */
object Extras2 extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // -ForEach combinator (Combinators/AggregateFunctionForEach.cpp):
    // elementwise aggregate across array columns — the 64-dim mean vector
    // of all embeddings (a centroid, as used by the IVF ANN operator).
    Q.df("q_agg_foreach", """
      SELECT ARRAY_TO_STRING(LIST_TRANSFORM(
               LIST({'p': i, 'v': v} ORDER BY i),
               s -> CAST(CAST(s.v AS DECIMAL(18,4)) AS VARCHAR)), ',') AS avg_foreach
      FROM (SELECT i, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS v
            FROM embeddings, GENERATE_SERIES(1, 64) t(i)
            GROUP BY i)""") { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("p", "v")))
        .groupBy("p").agg(round(avg(col("v").cast("double")), 4).as("v"))
        .agg(array_sort(collect_list(struct(col("p"), col("v")))).as("s"))
        .select(concat_ws(",", transform(col("s"),
          s => s.getField("v").cast("decimal(18,4)").cast("string"))).as("avg_foreach"))
    },

    // minMap / maxMap (AggregateFunctionSumMap.cpp family): per-key min and
    // max emitted as key-sorted entries.
    Q.df("q_agg_minmax_map", """
      SELECT user_id,
        STRING_AGG(event_type || ':' || CAST(CAST(mn AS DECIMAL(18,6)) AS VARCHAR),
                   ',' ORDER BY event_type) AS min_map,
        STRING_AGG(event_type || ':' || CAST(CAST(mx AS DECIMAL(18,6)) AS VARCHAR),
                   ',' ORDER BY event_type) AS max_map
      FROM (SELECT user_id, event_type,
              ROUND(MIN(value), 6) AS mn, ROUND(MAX(value), 6) AS mx
            FROM events GROUP BY user_id, event_type)
      GROUP BY user_id
      ORDER BY user_id""") { (s, dir) =>
      val entry = (k: Column, v: Column) =>
        concat(k, lit(":"), v.cast("decimal(18,6)").cast("string"))
      Tables.load(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(round(min("value"), 6).as("mn"), round(max("value"), 6).as("mx"))
        .groupBy("user_id")
        .agg(
          array_sort(collect_list(struct(col("event_type").as("_1"), col("mn").as("_2"))))
            .as("mins"),
          array_sort(collect_list(struct(col("event_type").as("_1"), col("mx").as("_2"))))
            .as("maxs"))
        .select(col("user_id"),
          concat_ws(",", transform(col("mins"),
            p => entry(p.getField("_1"), p.getField("_2")))).as("min_map"),
          concat_ws(",", transform(col("maxs"),
            p => entry(p.getField("_1"), p.getField("_2")))).as("max_map"))
        .orderBy("user_id")
    },

    // -Resample combinator (Combinators/AggregateFunctionResample.cpp):
    // one aggregate evaluated per bucket of a resample key, emitted as an
    // array — order counts over 6 totalprice bands.
    Q.sparkSql("q_agg_resample", """
      SELECT ARRAY_JOIN(TRANSFORM(ARRAY(
        COUNT(CASE WHEN o_totalprice >= 0      AND o_totalprice < 100000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 400000 AND o_totalprice < 500000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 500000 THEN 1 END)),
        x -> CAST(x AS STRING)), ',') AS count_resample
      FROM orders""",
      """
      SELECT ARRAY_TO_STRING([
        COUNT(CASE WHEN o_totalprice >= 0      AND o_totalprice < 100000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 400000 AND o_totalprice < 500000 THEN 1 END),
        COUNT(CASE WHEN o_totalprice >= 500000 THEN 1 END)], ',') AS count_resample
      FROM orders"""),

    // Mann-Whitney U statistic (AggregateFunctionMannWhitney.cpp) via
    // DISTRIBUTED midranks: aggregate per distinct value x first (shuffle
    // on x, partial-agg'd), then a prefix-sum window over the tiny
    // distinct-value table — midrank(x) = cum(x) - cnt(x) + (cnt(x)+1)/2.
    // No global window ever sees a full-input row (the round-1 form ranked
    // every lineitem row through ONE task).
    Q.shared("q_agg_mann_whitney", """
      WITH t AS (SELECT l_returnflag AS g, l_quantity AS x
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      c AS (SELECT x, COUNT(*) AS cnt,
              COUNT(CASE WHEN g = 'R' THEN 1 END) AS cr
            FROM t GROUP BY x),
      m AS (SELECT x, cnt, cr,
              SUM(cnt) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM c)
      SELECT
        ROUND(SUM(CAST(cr AS DOUBLE) * (CAST(cum - cnt AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1) / 2.0))
          - CAST(SUM(cr) AS DOUBLE) * (CAST(SUM(cr) AS DOUBLE) + 1) / 2.0, 2) AS u_stat,
        CAST(SUM(cr) AS BIGINT) AS n_r,
        CAST(SUM(cnt - cr) AS BIGINT) AS n_n
      FROM m"""),

    // sequenceCount('(?1)(?2)') (AggregateFunctionSequenceMatch.cpp
    // sequenceCount): non-overlapping signup→purchase chains per user —
    // a purchase closes a chain iff a signup occurred after the previous
    // purchase; greedy left-to-right, expressed with window functions.
    Q.sparkSql("q_agg_sequence_count", """
      WITH e AS (SELECT user_id, UNIX_MICROS(ts) AS t, event_type FROM events),
      m AS (SELECT user_id, t, event_type,
              MAX(CASE WHEN event_type = 'signup' THEN t END)
                OVER (PARTITION BY user_id ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup,
              MAX(CASE WHEN event_type = 'purchase' THEN t END)
                OVER (PARTITION BY user_id ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
            FROM e)
      SELECT user_id, COUNT(*) AS chains
      FROM m
      WHERE event_type = 'purchase'
        AND last_signup IS NOT NULL
        AND last_signup > COALESCE(prev_purchase, -1)
      GROUP BY user_id
      ORDER BY user_id""",
      """
      WITH e AS (SELECT user_id, EPOCH_US(ts) AS t, event_type FROM events),
      m AS (SELECT user_id, t, event_type,
              MAX(CASE WHEN event_type = 'signup' THEN t END)
                OVER (PARTITION BY user_id ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup,
              MAX(CASE WHEN event_type = 'purchase' THEN t END)
                OVER (PARTITION BY user_id ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
            FROM e)
      SELECT user_id, COUNT(*) AS chains
      FROM m
      WHERE event_type = 'purchase'
        AND last_signup IS NOT NULL
        AND last_signup > COALESCE(prev_purchase, -1)
      GROUP BY user_id
      ORDER BY user_id"""),

    // greatCircleDistance (src/Functions/greatCircleDistance.cpp):
    // haversine over deterministic synthetic coordinates.
    Q.shared("q_fn_geo_distance", """
      SELECT event_id,
        ROUND(2.0 * 6371.0088 * ASIN(SQRT(
          POW(SIN(RADIANS(lat2 - lat1) / 2.0), 2)
          + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
            * POW(SIN(RADIANS(lon2 - lon1) / 2.0), 2))), 3) AS km
      FROM (SELECT event_id,
              CAST(user_id % 90 AS DOUBLE) AS lat1,
              CAST(event_id % 180 - 90 AS DOUBLE) AS lon1,
              CAST((user_id * 7) % 90 AS DOUBLE) AS lat2,
              CAST((event_id * 3) % 180 - 90 AS DOUBLE) AS lon2
            FROM events) c
      ORDER BY event_id
      LIMIT 2000"""),

    // IPv4NumToString (src/Functions/FunctionsCodingIP.cpp).
    Q.sparkSql("q_fn_ipv4", """
      SELECT event_id,
        CONCAT(CAST(SHIFTRIGHT(ip, 24) & 255 AS STRING), '.',
               CAST(SHIFTRIGHT(ip, 16) & 255 AS STRING), '.',
               CAST(SHIFTRIGHT(ip, 8) & 255 AS STRING), '.',
               CAST(ip & 255 AS STRING)) AS ip_str
      FROM (SELECT event_id, (event_id * 16909060 + user_id) % 4294967296 AS ip
            FROM events) t
      ORDER BY event_id
      LIMIT 2000""",
      """
      SELECT event_id,
        CONCAT(CAST((ip >> 24) & 255 AS STRING), '.',
               CAST((ip >> 16) & 255 AS STRING), '.',
               CAST((ip >> 8) & 255 AS STRING), '.',
               CAST(ip & 255 AS STRING)) AS ip_str
      FROM (SELECT event_id, (event_id * 16909060 + user_id) % 4294967296 AS ip
            FROM events) t
      ORDER BY event_id
      LIMIT 2000"""),

    // format (src/Functions/format.cpp) → format_string / printf.
    Q.sparkSql("q_fn_format", """
      SELECT p_partkey,
        FORMAT_STRING('%s|%05d|%.2f', p_brand, p_size, p_retailprice) AS line
      FROM part
      ORDER BY p_partkey
      LIMIT 300""",
      """
      SELECT p_partkey,
        PRINTF('%s|%05d|%.2f', p_brand, p_size, p_retailprice) AS line
      FROM part
      ORDER BY p_partkey
      LIMIT 300""")
  )
}
