package graft.queries

import graft.{Q, Tables}
import graft.stream.Events

/** Windowed event analytics as BATCH queries (SURVEY.md §2B
  * "Streaming" — oracle row: "✓ as batch SQL (time_bucket)"). These
  * call the exact same graft.stream.Events transforms the streaming
  * path uses; EventsStreamSpec proves streaming equivalence on
  * MemoryStream input, and the DuckDB oracles here pin the window
  * semantics themselves (epoch-aligned buckets, exclusive window end,
  * gap-based session merge).
  */
object EventQueries {

  val queries: Map[String, Q] = Map(
    // tumbling 1-day windows per event type.
    "q60_window_tumbling" -> ((s, dir) =>
      Events.tumbling(Tables.events(s, dir), "1 day")
        .orderBy("window_start", "event_type")),

    // sliding 2-day windows every 1 day: each event in 2 windows.
    "q61_window_sliding" -> ((s, dir) =>
      Events.sliding(Tables.events(s, dir), "2 days", "1 day")
        .orderBy("window_start")),

    // session windows, 1-hour inactivity gap, per user.
    "q62_session_window" -> ((s, dir) =>
      Events.sessions(Tables.events(s, dir), "1 hour")
        .orderBy("user_id", "session_start")),
  )

  val oracles: Map[String, String] = Map(
    // Spark's window() aligns buckets to the epoch, exactly like
    // DuckDB's time_bucket.
    "q60_window_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // sliding(width=2d, slide=1d): an event at ts belongs to windows
    // starting at bucket(ts) and bucket(ts)-1d.
    "q61_window_sliding" ->
      """WITH u AS (
        |  SELECT unnest([time_bucket(INTERVAL '1 day', ts),
        |                 time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day']) AS ws,
        |         value
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM u GROUP BY ws ORDER BY window_start""".stripMargin,
    // session windows as gaps-and-islands: a new session starts when
    // the gap from the previous event (per user) is >= 1 hour — the
    // same boundary rule as Spark's exclusive session end.
    "q62_session_window" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL '1 hour'
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
