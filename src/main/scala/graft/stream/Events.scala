package graft.stream

import graft.pipeline.Report
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Typed row for the custom-state path (top-level for encoder
  * derivation). */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** Per-user running aggregate — both the state and the emitted row. */
case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** One point of a keyed metric series entering the streaming CUSUM
  * monitor (ts orders points within a key). */
case class MetricPoint(key: String, ts: java.sql.Timestamp, cents: Long)

/** CUSUM state per key: running prefix sum of (x − k) and its running
  * minimum — the two longs the prefix-min identity needs. */
case class CusumState(p: Long, minP: Long)

/** Emitted CUSUM row: the statistic after absorbing this point. */
case class CusumPoint(key: String, ts: java.sql.Timestamp, cents: Long,
                      cusum_cents: Long)

/** Streaming operators over the events table (SURVEY.md §2B
  * "Streaming"): windowed aggregation, session windows, watermarked
  * late-data handling, stateful dedup, and the R15-analog report sink.
  *
  * Every transform below is written against plain DataFrames so the
  * SAME function serves batch (q60-q62, oracle-checked against DuckDB)
  * and streaming (MemoryStream equivalence tests in EventsStreamSpec) —
  * Structured Streaming's core contract is exactly this batch/stream
  * unification.
  *
  * Scale notes: windowed/session aggs shuffle on (window, key) with
  * partial aggregation map-side; watermarks bound state size (without
  * one, streaming state grows forever — the 100 TB-stream killer).
  * At production scale events would be date-partitioned parquet so the
  * batch path gets partition pruning, and the streaming path would set
  * maxFilesPerTrigger for admission control. */
object Events {

  /** On-disk schema of the events fixture for the STREAMING file source
    * (streaming reads cannot infer schema), parameterized by the `ts`
    * encoding the directory actually holds — the fixtures have shipped
    * both TIMESTAMP(NANOS) (nanos long under Tables.sessionConf) and
    * TIMESTAMP(MICROS) (TIMESTAMP_NTZ) across rounds. */
  private def fileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file source over an events parquet directory — the
    * production entry point (MemoryStream is test-only). New files
    * appearing under `dir` become micro-batches; at 100 TB scale pair
    * with maxFilesPerTrigger for admission control and a date-
    * partitioned layout for pruning. The `ts` physical encoding is
    * sniffed from the directory's existing footers with one driver-side
    * batch read (metadata only — no row scan), then DECLARED to the
    * stream; normalization to micros TimestampType matches the batch
    * loader Tables.events so batch ≡ stream equivalence specs hold on
    * either fixture generation. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val observed = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream
      .schema(fileSchema(observed))
      .parquet(dir)
    observed match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling window aggregation per event type (fixed, non-overlapping
    * buckets). Money-style exact sum: DECIMAL accumulate, DOUBLE out. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window aggregation: width/slide overlapping buckets (an
    * event lands in width/slide windows). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n"), col("sum_value"))

  /** Session windows per user: a session extends while consecutive
    * events arrive within `gap`; an event at exactly start+gap opens a
    * NEW session (Spark's window end is exclusive). */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** OHLC BARS (open/high/low/close + volume) per (window, type) — the
    * time-series downsampling shape (market candlesticks, metric
    * rollups). DETERMINISM: `first`/`last` are arrival-order-dependent
    * and therefore wrong in any distributed or streaming aggregation;
    * open/close are `min_by`/`max_by` keyed on the TOTAL order
    * (ts, event_id), which merge associatively — the same rows give
    * the same bars under any partitioning, any micro-batching (the
    * batch ≡ stream law EventsStreamSpec pins). Works unchanged as a
    * streaming aggregation: the state per open bar is two (key,
    * value) pairs + min/max/count. */
  def ohlcBars(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("open"), col("high"),
        col("low"), col("close"))

  /** Watermarked tumbling agg for streaming: rows later than `delay`
    * behind the max seen ts are dropped and their windows finalized.
    * (Watermark BEFORE groupBy — after it, it wouldn't bound state.) */
  def tumblingWithWatermark(events: DataFrame, width: String, delay: String): DataFrame =
    tumbling(events.withWatermark("ts", delay), width)

  /** Streaming distinct-per-window via mergeable HLL sketches — the
    * streaming face of the q127/q134/q138 rollup-table pattern. Exact
    * streaming count-distinct would keep EVERY value id in the state
    * store (state ∝ distinct users per window — unbounded at stream
    * scale); here the streaming aggregation's state IS the fixed
    * 2^lgK-register sketch buffer per (window, type), merged
    * incrementally across micro-batches by the same register-max union
    * the batch rollup uses. Emits the estimate AND the sketch bytes:
    * a sink persisting these rows day-partitioned yields exactly the
    * rollup table q134/q138 query (arbitrary-range / trailing-window
    * unions) without ever rescanning the stream. */
  def distinctPerWindow(events: DataFrame, width: String, delay: String,
                        lgK: Int = 12): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("hll"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        hll_sketch_estimate(col("hll")).as("est_users"),
        col("hll"))

  /** Windowed QUANTILES in-stream (the p50/p95-latency observability
    * query, r14) — distinctPerWindow's discipline for the percentile
    * family: the streaming aggregation's state IS the fixed-size KLL
    * sketch buffer per (window, type) (expressions/KllExpressions'
    * TypedImperativeAggregate — Spark serializes the buffer into the
    * state store and merges incrementally across micro-batches, the
    * same mechanics as its own hll_sketch_agg). Emits p50/p95, the
    * EXACT absorbed count (getN), AND the sketch bytes: a sink
    * persisting these rows day-partitioned yields exactly q319's
    * rollup table / q321's rolling input without rescanning the
    * stream. Values are envelope-approximate (the KLL contract),
    * counts exact; EventsStreamSpec gates batch ≡ stream on n and
    * envelope on the quantiles. */
  def quantilesPerWindow(events: DataFrame, width: String, delay: String,
                         k: Int = 200): DataFrame =
    events.filter(col("value").isNotNull)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(call_function("graft_kll_agg",
        col("value").cast("double"), lit(k)).as("kll"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        call_function("graft_kll_n", col("kll")).as("n_values"),
        round(call_function("graft_kll_quantile", col("kll"), lit(0.5)), 4)
          .as("p50"),
        round(call_function("graft_kll_quantile", col("kll"), lit(0.95)), 4)
          .as("p95"),
        col("kll"))

  /** Stateful exact-once dedup by event_id within the watermark
    * horizon: state for an id is dropped once the watermark passes it,
    * so state stays bounded while duplicates inside the lateness window
    * are still caught — the streaming analog of q50's content dedup. */
  def dedupWithinWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful operator via flatMapGroupsWithState (the seam for
    * state no built-in aggregation expresses — SURVEY.md §2B last
    * streaming row): per-user running totals that ACCUMULATE across
    * micro-batches, emitted in Update mode each time a user's group
    * receives data.
    *
    * State hygiene at stream scale: event-time timeout — a user idle
    * past `idleGap` (by watermark time, never wall-clock) has their
    * state emitted once more and REMOVED, so state size tracks active
    * users, not all users ever seen. Without a timeout, custom state
    * grows forever — the stateful analog of the missing-watermark
    * mistake. */
  def userRunningTotals(events: DataFrame, delay: String, idleGap: String)
      : Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleGap))
    val gapMillis = gapMs.months * 2592000000L + gapMs.days * 86400000L +
      gapMs.microseconds / 1000L
    events.withWatermark("ts", delay)
      .select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove() // idle user: final emit, state freed
            Iterator(last)
          } else {
            val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; tot += r.value
              maxTs = math.max(maxTs, r.ts.getTime)
            }
            val cur = UserTotal(uid, n, tot)
            state.update(cur)
            state.setTimeoutTimestamp(maxTs + gapMillis)
            Iterator(cur)
          })
  }

  /** Streaming DEBOUNCE — q154's burst-collapse rule as a stateful
    * stream operator: emit an event only when its (user, type) key has
    * been quiet for >= `quietSec` since the PREVIOUS RAW event (the
    * previous event always advances the clock, kept or not — islands
    * semantics, identical to the batch lag rule). State per key is ONE
    * long (last raw event-time second) — constant, vs the
    * dropDuplicates state that grows with distinct ids — and
    * event-time timeout frees keys idle past `idleGap`.
    *
    * Ordering contract: rows are sorted by (ts, event_id) WITHIN each
    * micro-batch (flatMapGroupsWithState hands them over unordered);
    * across batches the operator assumes per-key event-time-ordered
    * arrival — the standard debounce-stream assumption; a late event
    * older than the stored clock is simply judged against it.
    * EventsStreamSpec pins stream ≡ batch-q154 on in-order input. */
  def debounce(events: DataFrame, delay: String, quietSec: Long,
               idleGap: String): Dataset[EventRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gap = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleGap))
    val gapMillis = gap.months * 2592000000L + gap.days * 86400000L +
      gap.microseconds / 1000L
    events.withWatermark("ts", delay)
      .select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(r => (r.user_id, r.event_type))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Long, String), rows: Iterator[EventRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: nothing buffered, just free state
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
            var lastRawSec = state.getOption.getOrElse(Long.MinValue)
            val kept = sorted.filter { r =>
              val sec = r.ts.getTime / 1000L
              val keep = lastRawSec == Long.MinValue || sec - lastRawSec >= quietSec
              lastRawSec = sec // raw events always advance the clock
              keep
            }
            state.update(lastRawSec)
            state.setTimeoutTimestamp(sorted.last.ts.getTime + gapMillis)
            kept.iterator
          })
  }

  /** STREAMING CUSUM drift monitor — q213's detector run LIVE on a
    * keyed metric series. The batch form linearizes Sᵢ = max(0, Sᵢ₋₁
    * + (xᵢ − k)) with the prefix-min identity Sᵢ = Pᵢ − min(0,
    * min_{j≤i} Pⱼ); the identity's running pair (P, min P) is
    * PREFIX-COMPOSABLE, so it IS the streaming state — two longs per
    * key, constant forever, versus buffering any history. Each
    * incoming point folds in event-time order and emits its
    * statistic; the reference level `k` is a PARAMETER (the batch
    * job's baseline — a live monitor cannot use a mean over days it
    * hasn't seen; the standard offline-baseline/online-score split of
    * anomalyFlags).
    *
    * Ordering contract (debounce's): rows sort by ts within each
    * micro-batch; across batches the operator assumes per-key
    * event-time-ordered arrival. Points must additionally be UNIQUE
    * per (key, ts) — aggregate the raw stream to the monitoring
    * grain first (q213's daily-cents grain): with duplicate
    * timestamps the min-P fold visits ties in arrival order and the
    * emitted per-point statistic becomes order-dependent (the batch
    * window form has the same ambiguity — the grain rule is the
    * contract, not a streaming quirk). EventsStreamSpec pins stream
    * ≡ the batch window formulation across a 3-batch split, and the
    * sequential-fold law is already pinned by EventAnalyticsSpec.
    * State for idle keys frees via event-time timeout. */
  def cusum(points: Dataset[MetricPoint], k: Long, delay: String,
            idleGap: String): Dataset[CusumPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    val gap = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleGap))
    val gapMillis = gap.months * 2592000000L + gap.days * 86400000L +
      gap.microseconds / 1000L
    points.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[MetricPoint],
         state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(CusumState(0L, 0L))
            val out = sorted.map { r =>
              val p = st.p + r.cents - k
              st = CusumState(p, math.min(st.minP, p))
              CusumPoint(key, r.ts, r.cents, p - math.min(0L, st.minP))
            }
            state.update(st)
            state.setTimeoutTimestamp(sorted.last.ts.getTime + gapMillis)
            out.iterator
          })
  }

  /** Stream-static enrichment join: each micro-batch of events joined
    * against a STATIC dimension (user attributes, allow-lists). The
    * static side is re-planned per batch, so broadcast/AQE decisions
    * apply normally and no streaming state is kept — the cheapest
    * streaming join, and the one to reach for whenever the right side
    * isn't itself a stream. Works identically on batch DataFrames
    * (EventsStreamSpec pins stream ≡ batch). */
  /** Stream-static POINT-IN-TIME enrichment — the SCD2 lookup in
    * motion: each event joins the dimension VERSION valid at its
    * EVENT time (half-open [valid_from, valid_to)), not the current
    * one — the feature-store correctness rule ("training-serving
    * skew" starts with as-of-now lookups in as-of-then pipelines).
    * SCD2 rows are disjoint per key, so the range join matches ≤ 1
    * version; events with no valid version (or an unknown key) keep
    * null payloads. Stream-static non-equi joins are stateless on the
    * stream side (the dimension broadcasts when small — the usual
    * case), so this costs no watermark and no state store. Batch ≡
    * stream by construction (EventsStreamSpec pins it). */
  def enrichAsOf(events: DataFrame, dim: DataFrame, key: String,
                 valueCols: Seq[String], prefix: String = "dim_"): DataFrame = {
    val d = dim.select(col(key).as("__dk"), col("valid_from").as("__vf"),
      col("valid_to").as("__vt"), struct(valueCols.map(col): _*).as("__dpay"))
    events.join(d, events(key) === col("__dk") &&
        col("ts") >= col("__vf") && col("ts") < col("__vt"), "left_outer")
      .select(events.columns.map(col).toSeq ++
        valueCols.map(c => col(s"__dpay.$c").as(prefix + c)): _*)
  }

  def enrichWithStatic(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** STREAMING SEASONAL-ANOMALY FLAGS — q197's alert feed run live:
    * incoming events join the PERSISTED per-(event_type, hour-of-day)
    * baseline (a static table the batch job refreshes — the standard
    * monitoring split: heavy moments offline, cheap scoring online)
    * and emit only |z| > k rows. A stream-static inner join keeps no
    * streaming state at all — the baseline broadcasts (|types|·24
    * rows), so the scoring is scan-local per micro-batch. Works
    * unchanged on a batch frame (the batch ≡ stream contract;
    * EventsStreamSpec pins equivalence on the fixture). `baseline`
    * columns: event_type, hod, mean, std (std > 0 rows only). */
  def anomalyFlags(events: DataFrame, baseline: DataFrame,
                   k: Double): DataFrame =
    events
      .withColumn("hod", hour(col("ts")))
      .withColumn("v",
        round(col("value"), 4).cast("decimal(18,4)").cast("double"))
      .join(broadcast(baseline), Seq("event_type", "hod"))
      .withColumn("z", round((col("v") - col("mean")) / col("std"), 6))
      .filter(abs(col("z")) > k)
      .select(col("event_id"), col("event_type"), col("hod"), col("v"),
        col("z"))

  /** Stream-stream join with bounded state: clicks matched to the same
    * user's purchases within `horizon` AFTER the click. BOTH sides are
    * watermarked and the join condition carries the time bound — the
    * two things that let Spark discard state (an unbounded stream-
    * stream join buffers both streams forever, the 100 TB-stream
    * killer). Inner join: a click emits only once a qualifying
    * purchase arrives. */
  def clickToPurchase(events: DataFrame, delay: String, horizon: String): DataFrame =
    clickToPurchaseJoin(events, delay, horizon, "inner")

  /** Left-OUTER stream-stream join — the conversion-funnel form: every
    * click emits, matched clicks as they pair, UNMATCHED clicks as
    * null-purchase rows once the watermark proves no qualifying
    * purchase can still arrive (click_ts + horizon + delay behind the
    * purchase watermark). The null rows are the abandonment signal an
    * inner join silently drops — and they are exactly why outer
    * streaming joins REQUIRE the watermark + time bound (state can
    * only be declared unmatched when late data is provably done;
    * Spark rejects an unbounded outer stream-stream join outright).
    * Same bounded state as the inner form; emission of unmatched rows
    * trails the data by the watermark delay, the price of provable
    * completeness. */
  def clickToPurchaseOuter(events: DataFrame, delay: String, horizon: String): DataFrame =
    clickToPurchaseJoin(events, delay, horizon, "leftOuter")

  /** FULL-OUTER stream-stream join — completes the join matrix
    * (inner = conversions, left = + abandonment, full = + ORGANIC
    * purchases that had no qualifying click, the null-click rows
    * marketing calls direct conversions). Both null-padded sides emit
    * only on watermark proof, exactly as the left-outer doc describes;
    * state bounds are identical. Spark supports full-outer
    * stream-stream only under this watermark + time-bound shape. */
  def clickToPurchaseFull(events: DataFrame, delay: String, horizon: String): DataFrame =
    clickToPurchaseJoin(events, delay, horizon, "fullOuter")

  /** Pipeline run-metrics seam (`Dataset.observe` — the Spark-native
    * answer to "count rows and nulls without a second scan"): attaches
    * named data-quality counters that ride the existing job and
    * surface per micro-batch in
    * `StreamingQueryProgress.observedMetrics("dq")` (batch callers
    * read them via `Observation`). The aggregates run inside the same
    * stage as the consuming transform — zero extra passes, the
    * property that makes per-batch DQ affordable at 100 TB (a
    * `.count()` beside the write would double the read). */
  def withQualityMetrics(events: DataFrame): DataFrame =
    events.observe("dq",
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
      max(col("ts")).as("max_event_ts"))

  private def clickToPurchaseJoin(events: DataFrame, delay: String,
                                  horizon: String, joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** R15 analog, streaming: per micro-batch, render an HTML report of
    * the batch rows and write it — SKIPPING empty batches entirely
    * (R12's empty ⇒ no artifact, per batch). Artifacts land at
    * <outDir>/report-<batchId>.html. */
  def reportSink(aggregated: DataFrame, outDir: String): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Report.writeReport(batch, s"events batch $batchId",
          s"$outDir/report-$batchId.html")
        () // discard the Boolean — foreachBatch wants Unit
      }

  /** Streaming WINDOWED LEADERBOARD sink — the "top-k per window,
    * continuously updated" dashboard feed: a tumbling-window ×
    * user aggregation rides Structured Streaming state, and each
    * micro-batch re-ranks every window with the grouped top-k idiom
    * (`row_number() OVER (PARTITION BY window ORDER BY total DESC)`)
    * in `foreachBatch`, overwriting one parquet leaderboard snapshot.
    * Ranking is a BATCH plan inside the micro-batch, so sessions with
    * GraftExtensions / RewriteGroupedTopK re-plan it as
    * GroupedTopKExec — the custom physical operator serves the
    * streaming surface for free (windows × k rows out, heaps instead
    * of per-window sorts). Complete output mode: the ranking needs
    * every group of a window, not just the batch's deltas; production
    * bounds the retained windows with a watermark + window filter.
    * Deterministic: ties break on user_id; overwrite is idempotent, so
    * checkpoint replays converge (the mergeSink discipline). */
  def leaderboardSink(events: DataFrame, width: String, k: Int,
                      outDir: String): DataStreamWriter[Row] =
    events
      .groupBy(window(col("ts"), width).as("w"), col("user_id"))
      .agg(sum(col("value")).as("total"))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.{Window => W}
        batch
          .withColumn("rn", row_number().over(
            W.partitionBy(col("w")).orderBy(desc("total"), col("user_id"))))
          .filter(col("rn") <= k)
          .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
            col("user_id"), col("total"), col("rn"))
          .write.mode("overwrite").parquet(outDir)
      }

  /** Streaming MERGE sink — CDC compaction into a queryable parquet
    * snapshot: each micro-batch keeps its latest row per key (greatest
    * (orderCol, payload) — deterministic even when orderCol ties),
    * upserts into the existing snapshot via `Ingest.upsert`, and
    * replaces the snapshot via write-to-temp + rename-aside so a
    * concurrent reader never observes a HALF-WRITTEN directory and a
    * crash at ANY point never loses the snapshot: the old snapshot is
    * renamed to `<path>.old-<batchId>` (not deleted) before the new
    * one renames into place, and the replay of that batchId restores
    * it if the second rename never ran. (A reader may still race the
    * swap and find the path momentarily absent — two renames are two
    * operations; a manifest or view layer closes that visibility gap
    * on real deployments.)
    *
    * Scale notes: the per-batch work is one join of (snapshot ×
    * micro-batch) — at 100 TB the snapshot side would be bucketed on
    * the key (Warehouse.writeBucketed) making the merge Exchange-free,
    * and the swap would target a partition, not the whole table. The
    * rename is atomic on HDFS-like filesystems; on object stores it is
    * copy+delete — pair with a manifest there. Exactly-once: the merge
    * is idempotent per key (re-applying a batch yields the same
    * snapshot), so checkpoint replays converge. */
  def mergeSink(updates: DataFrame, key: String, orderCol: String,
                snapshotPath: String): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, key, orderCol, snapshotPath, batchId)
      }

  /** Cross-batch streaming Bloom dedup (VERDICT r9 #4): the true
    * incremental-corpus shape of `Dedup.bloomDedupAgainst` — the seen
    * set is a Bloom sketch CARRIED ACROSS micro-batches, persisted
    * beside the checkpoint, so each batch dedupes against everything
    * every earlier batch saw at constant memory (the sketch, ~1.2 MB
    * per 10⁶ expected items, is the only cross-batch state — the
    * accumulated corpus itself is never re-read, never shuffled).
    *
    * Per batch: load the latest persisted sketch from a batch id
    * STRICTLY BELOW the current one, drop rows it claims seen, write
    * survivors to `<outDir>/batch-<id>`, fold the batch's own keys
    * into a new sketch, OR-merge it with the prior, and persist as
    * `<sketchDir>/sketch-<id>` (write-to-tmp + rename). Semantics
    * match bloomDedupAgainst: no false negatives ever; ~fpp of
    * genuinely-new rows falsely dropped; within-batch duplicates
    * untouched (compose with exactDedup); null-text rows kept and
    * never inserted.
    *
    * Exactly-once via determinism, same contract as `mergeSink`: a
    * replayed batch id re-loads the sketch state from BEFORE that
    * batch (the strictly-below rule), recomputes the identical keep
    * set, OVERWRITES the same output directory, and re-persists the
    * identical merged sketch — convergent at every crash point
    * (EventsStreamSpec chaos-pins replay and restart-from-
    * checkpoint). Sketches older than the one generation a replay can
    * need are pruned. */
  def bloomDedupSink(docs: DataFrame, textCol: String, expectedItems: Long,
                     fpp: Double, outDir: String, sketchDir: String)
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        bloomDedupBatch(batch, textCol, expectedItems, fpp,
          outDir, sketchDir, batchId)
      }

  /** One micro-batch of the Bloom dedup sink, exposed for direct
    * invocation so the replay contract is testable (the mergeBatch
    * pattern). */
  def bloomDedupBatch(batch: DataFrame, textCol: String, expectedItems: Long,
                      fpp: Double, outDir: String, sketchDir: String,
                      batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(sketchDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // latest sketch from a PRIOR batch — never this batch's own (a
    // replay must not dedupe the batch against itself)
    val priorId: Option[Long] =
      if (!fs.exists(dir)) None
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("sketch-\\d+") =>
          n.stripPrefix("sketch-").toLong }
        .filter(_ < batchId) match {
          case Seq() => None
          case ids => Some(ids.max)
        }
    val prior: Array[Byte] = priorId.map { id =>
      val p = new org.apache.hadoop.fs.Path(dir, s"sketch-$id")
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      buf
    }.orNull
    graft.ops.Dedup.bloomFilterFresh(batch, textCol, prior)
      .write.mode("overwrite").parquet(s"$outDir/batch-$batchId")
    val merged = graft.ops.Dedup.mergeBloomSketches(prior,
      graft.ops.Dedup.buildBloomSketch(batch, textCol, expectedItems, fpp))
    if (merged != null) {
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, s"sketch-$batchId.tmp")
      val out = fs.create(tmp, true)
      try out.write(merged) finally out.close()
      val dest = new org.apache.hadoop.fs.Path(dir, s"sketch-$batchId")
      fs.delete(dest, false) // replay overwrites its own generation
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"sketch persist failed for $dest")
      // prune: a replay can only target THIS batch (earlier ids are
      // offset-committed), which needs only the prior generation.
      fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("sketch-\\d+") =>
          n.stripPrefix("sketch-").toLong }
        .filter(id => id < batchId && !priorId.contains(id))
        .foreach(id => fs.delete(
          new org.apache.hadoop.fs.Path(dir, s"sketch-$id"), false))
    }
  }

  /** STREAMING MAINTENANCE OF THE REVENUE ROLLUP — the incremental
    * loop that keeps plans.RewriteAggOnRollup's materialized view
    * fresh (q336 reads it; this writes it): each micro-batch of
    * lineitem-shaped rows is folded to day-grain partials and
    * ADD-merged into the rollup snapshot. Addition is NOT idempotent,
    * so replay safety cannot ride mergeSink's upsert trick; it rides
    * the bloomDedupSink GENERATION discipline instead — each batch
    * writes `gen-<batchId>` derived from the latest generation
    * STRICTLY BELOW it, so a replayed batch recomputes the identical
    * generation instead of double-adding, convergent at every crash
    * point. Generations older than the one a replay can need are
    * pruned. Decimal partials keep the rollup bit-identical to a
    * from-scratch rebuild (EventsStreamSpec pins stream-maintained ≡
    * batch-built, and that the REWRITE answers from the maintained
    * table). */
  def additiveRollupSink(lineitems: DataFrame,
                         rollupDir: String): DataStreamWriter[Row] =
    lineitems.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        additiveRollupBatch(batch, rollupDir, batchId)
      }

  /** Latest rollup generation under `rollupDir` (what the rewrite's
    * `spark.graft.rollup.daily.path` should point at), if any. */
  def latestRollup(spark: SparkSession, rollupDir: String): Option[String] = {
    val dir = new org.apache.hadoop.fs.Path(rollupDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("gen-\\d+") =>
        n.stripPrefix("gen-").toLong } match {
        case Seq() => None
        case ids => Some(s"$rollupDir/gen-${ids.max}")
      }
  }

  /** One micro-batch of the additive rollup sink (direct-invocation
    * form — the mergeBatch/bloomDedupBatch testability pattern). */
  def additiveRollupBatch(batch: DataFrame, rollupDir: String,
                          batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val partial = batch.groupBy(
        col("l_shipdate").cast("date").cast("timestamp_ntz").as("day"),
        col("l_returnflag"))
      .agg(
        // rev stays SUM's native DECIMAL(28,4) — a downcast to (18,4)
        // would NULL on overflow and the MV rewrite's SUM would
        // silently skip it (r15, ADVICE; matches writeDailyRevenueRollup)
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"),
        count(lit(1)).as("cnt"))
    val dir = new org.apache.hadoop.fs.Path(rollupDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val priorId: Option[Long] =
      if (!fs.exists(dir)) None
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("gen-\\d+") =>
          n.stripPrefix("gen-").toLong }
        .filter(_ < batchId) match {
          case Seq() => None
          case ids => Some(ids.max)
        }
    val merged = priorId match {
      case None => partial
      case Some(id) =>
        val prior = spark.read.parquet(s"$rollupDir/gen-$id")
        prior.select(col("day"), col("l_returnflag"),
            col("rev").as("__pr"), col("cnt").as("__pc"))
          .join(partial.select(col("day"), col("l_returnflag"),
            col("rev").as("__nr"), col("cnt").as("__nc")),
            Seq("day", "l_returnflag"), "full_outer")
          .select(col("day"), col("l_returnflag"),
            (coalesce(col("__pr"), lit(0).cast("decimal(28,4)")) +
              coalesce(col("__nr"), lit(0).cast("decimal(28,4)")))
              .cast("decimal(28,4)").as("rev"),
            (coalesce(col("__pc"), lit(0L)) + coalesce(col("__nc"), lit(0L)))
              .as("cnt"))
    }
    val tmp = new org.apache.hadoop.fs.Path(dir, s"gen-$batchId.tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(dir, s"gen-$batchId")
    fs.delete(dest, true) // a replay overwrites its own generation
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rollup generation persist failed: $dest")
    // prune: a replay can only target THIS batch id; it needs only
    // the prior generation
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("gen-\\d+") =>
        n.stripPrefix("gen-").toLong }
      .filter(id => id < batchId && !priorId.contains(id))
      .foreach(id => fs.delete(
        new org.apache.hadoop.fs.Path(dir, s"gen-$id"), true))
  }

  /** One micro-batch of the MERGE sink, exposed for direct invocation
    * so the checkpoint-replay contract is TESTABLE: after a crash
    * between the sink commit and the offset commit, Structured
    * Streaming re-runs foreachBatch with the SAME batch data and
    * batchId — exactly a second `mergeBatch` call. The merge is
    * idempotent per key (latest-per-key of the same rows upserts the
    * same values), so the replay converges to the identical snapshot —
    * EventsStreamSpec's chaos test pins this, plus restart-from-
    * checkpoint continuation. */
  def mergeBatch(batch: DataFrame, key: String, orderCol: String,
                 snapshotPath: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val others = batch.columns.filter(c => c != key && c != orderCol)
      val latest = batch.groupBy(col(key))
        .agg(max_by(
          struct((Seq(orderCol) ++ others).map(col): _*),
          struct(col(orderCol) +: others.map(col): _*)).as("__r"))
        .select(col(key) +:
          (Seq(orderCol) ++ others).map(c => col(s"__r.$c").as(c)): _*)
        .select(batch.columns.map(col): _*) // restore original order
      val hadoopPath = new org.apache.hadoop.fs.Path(snapshotPath)
      val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val aside = new org.apache.hadoop.fs.Path(s"$snapshotPath.old-$batchId")
      // MID-SWAP RECOVERY (ADVICE r8): a crash after the aside-rename
      // below but before the rename-into-place leaves the snapshot path
      // absent with the pre-merge state preserved under the aside name
      // for THIS batchId — Structured Streaming replays the same batch,
      // so restoring it here hands the re-merge the pre-crash keys.
      if (!fs.exists(hadoopPath) && fs.exists(aside) &&
          !fs.rename(aside, hadoopPath))
        throw new java.io.IOException(
          s"snapshot recovery from $aside failed for $snapshotPath")
      // upsert returns key-first column order; restore the batch's
      // order BEFORE writing, or the snapshot schema silently rotates
      // after the first merge and the NEXT batch's upsert fails its
      // schema check (found by the chaos replay test — the original
      // two-batch spec never reached a third merge).
      val merged =
        if (fs.exists(hadoopPath))
          graft.pipeline.Ingest.upsert(
            spark.read.parquet(snapshotPath), latest, key)
            .select(batch.columns.map(col): _*)
        else latest
      val tmp = new org.apache.hadoop.fs.Path(s"$snapshotPath.tmp-$batchId")
      merged.write.mode("overwrite").parquet(tmp.toString)
      // Swap via rename-aside, NEVER delete-then-rename: a crash
      // between a delete and a rename would lose the snapshot outright
      // (replay would rebuild from only the current batch). With the
      // aside dance every crash point leaves the data recoverable —
      // either the snapshot is intact, or the recovery branch above
      // restores it from the aside on replay.
      if (fs.exists(hadoopPath)) {
        fs.delete(aside, true) // stale aside from a crash after a completed swap
        if (!fs.rename(hadoopPath, aside))
          throw new java.io.IOException(
            s"snapshot aside-rename failed for $snapshotPath")
      }
      if (!fs.rename(tmp, hadoopPath))
        throw new java.io.IOException(s"snapshot swap failed for $snapshotPath")
      fs.delete(aside, true)
    }
  }
}
