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

    // stream-stream join transform in batch mode: clicks matched to
    // same-user purchases within 10 minutes AFTER the click (the
    // time-bound condition that keeps streaming state finite —
    // EventsStreamSpec proves the MemoryStream run emits the same
    // pairs). Timestamps as epoch micros for compare-dtype parity.
    "q63_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Events.clickToPurchase(Tables.events(s, dir),
          delay = "5 minutes", horizon = "10 minutes")
        .select(col("click_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_us"),
          col("purchase_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
        .orderBy("click_id", "purchase_id")
    }),

    // CDC MERGE COMPACTION under the hash gate (VERDICT r7 lineage —
    // the last substantial pipeline path that was spec-only): three
    // TIME-PARTITIONED micro-batches of events merge sequentially into
    // a fresh snapshot via the EXACT foreachBatch body the streaming
    // mergeSink runs (Events.mergeBatch: in-batch latest-per-key, then
    // Ingest.upsert, then the crash-safe rename-aside swap). Because
    // the batches partition event time, the compacted snapshot must
    // equal latest-per-key over the WHOLE table — which is precisely
    // the DuckDB window oracle, so batch-split invariance is what the
    // hash match proves. Batch boundaries are fixed date literals valid
    // at every SF (the fixture spans 2024-01-01..01-30). Scale: each
    // merge is one join of (snapshot × micro-batch); at 100 TB the
    // snapshot side is bucketed on the key (Warehouse.writeBucketed)
    // making it Exchange-free, and the swap targets a partition.
    "q99_merge_snapshot" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val snap = graft.TempDirs.scratch("graft-merge-") + "/snapshot"
      val cut1 = lit("2024-01-11").cast("timestamp")
      val cut2 = lit("2024-01-21").cast("timestamp")
      Seq(
        ev.filter(col("ts") < cut1),
        ev.filter(col("ts") >= cut1 && col("ts") < cut2),
        ev.filter(col("ts") >= cut2)
      ).zipWithIndex.foreach { case (b, i) =>
        Events.mergeBatch(b, "user_id", "ts", snap, i.toLong)
      }
      s.read.parquet(snap)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // merge compaction ≡ latest-per-key over the whole table: ties in
    // ts cannot cross batch boundaries (same ts ⇒ same time partition),
    // and within a batch mergeBatch's max_by struct breaks them by
    // event_id next — event_id is unique, so ORDER BY ts DESC,
    // event_id DESC picks the identical winner.
    "q99_merge_snapshot" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, value AS last_value
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q63_stream_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |       epoch_us(c.ts) AS click_us,
        |       p.event_id AS purchase_id,
        |       epoch_us(p.ts) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
        |ORDER BY click_id, purchase_id""".stripMargin,
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
