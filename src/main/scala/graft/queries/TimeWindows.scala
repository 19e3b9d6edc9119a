package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.streaming.WindowView

/** Batch-mode time-window queries (FunctionsTimeWindow.cpp:719-723 tumble/
  * hop; session windows are a Spark bonus the reference lacks). The same
  * tumble/hop code paths run under Structured Streaming in StreamingSpec —
  * these oracled batch runs pin their arithmetic.
  */
object TimeWindows extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // TUMBLE: 1-hour windows. window().start == epoch-floor to the hour.
    Q.df("q_tumble_1h", """
      SELECT DATE_TRUNC('hour', ts) AS w_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events
      GROUP BY 1, 2
      ORDER BY w_start, event_type""") { (s, dir) =>
      WindowView.tumbleAgg(Tables.load(s, dir, "events"), "1 hour")
        .orderBy("w_start", "event_type")
    },

    // HOP: 1-hour window sliding 15 minutes — every event lands in 4
    // windows; the oracle enumerates the 4 candidate starts per event.
    Q.df("q_hop_1h_15m", """
      WITH starts AS (
        SELECT e.event_type,
          MAKE_TIMESTAMP(CAST((FLOOR(EPOCH_US(e.ts) / 900000000) * 900 - k.k * 900) * 1000000 AS BIGINT)) AS w_start,
          e.ts
        FROM events e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k) k)
      SELECT w_start, event_type, COUNT(*) AS n
      FROM starts
      WHERE ts < w_start + INTERVAL 1 HOUR AND ts >= w_start
      GROUP BY w_start, event_type
      ORDER BY w_start, event_type""") { (s, dir) =>
      WindowView.hopAgg(Tables.load(s, dir, "events"), "1 hour", "15 minutes")
        .orderBy("w_start", "event_type")
    },

    // SESSION windows (Spark bonus): 2-hour-gap sessionization per user,
    // oracle via gaps-and-islands.
    Q.df("q_session_windows", """
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, COUNT(DISTINCT sid) AS n_sessions, COUNT(*) AS n_events
      FROM sessions
      GROUP BY user_id
      ORDER BY user_id""") { (s, dir) =>
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").cast("bigint").as("n_events"))
        .select(col("user_id"), col("n_sessions"), col("n_events"))
        .orderBy("user_id")
    },

    // Stream-stream interval join, batch form (the same plan runs
    // streaming — StreamingSpec pins stream==batch): every click joined
    // to the same user's purchases within 30 minutes. The µs-truncated
    // timestamp (Tables.load) is mirrored with EPOCH_US in the oracle so
    // boundary pairs agree. State-bounding watermarks are the streaming
    // half of the contract; see streaming/WindowView.intervalJoin.
    Q.df("q_interval_join", """
      SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id
      FROM events l JOIN events r ON l.user_id = r.user_id
        AND l.event_type = 'click' AND r.event_type = 'purchase'
        AND EPOCH_US(r.ts) >= EPOCH_US(l.ts)
        AND EPOCH_US(r.ts) <= EPOCH_US(l.ts) + 1800000000
      ORDER BY l.user_id, l_id, r_id""") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      graft.streaming.WindowView.intervalJoin(ev, ev,
        "click", "purchase", "1 day", "30 minutes")
        .orderBy("user_id", "l_id", "r_id")
    }
  )
}
