package graft

import graft.stream.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.Instant

/** One event row for MemoryStream (top-level: encoders need a static
  * case class, not an inner one). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** One document row for the streaming Bloom dedup sink tests. */
case class DocRow(doc_id: Long, text: String)

/** Streaming tests (SURVEY.md §5.2 #4): MemoryStream in, memory/file
  * sink out, NEVER wall-clock — watermark movement is driven entirely
  * by event timestamps. Batch/stream equivalence is the core claim:
  * q60-q62 run the same graft.stream.Events transforms in batch mode
  * against DuckDB oracles; these tests prove the streaming path
  * computes the same answers and that watermarks bound state/drop
  * late data as designed. */
class EventsStreamSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.from(Instant.parse(s))
  private def tmpDir(): Path = Files.createTempDirectory("graft-stream-")

  private var nextQ = 0
  private def queryName(): String = { nextQ += 1; s"graft_stream_q$nextQ" }

  test("streaming tumbling agg (complete mode) equals the batch q60 transform") {
    val rows = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:04:00Z"), 2, "click", 2.5),
      Ev(3, t("2024-01-01T10:12:00Z"), 1, "view", 4.0),
      Ev(4, t("2024-01-01T10:13:00Z"), 3, "click", 0.5),
      Ev(5, t("2024-01-01T11:00:00Z"), 1, "view", 3.0))
    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val name = queryName()
    val q = Events.tumbling(ms.toDF(), "10 minutes").writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(name).collect().toSet
      val batch = Events.tumbling(rows.toDF(), "10 minutes").collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming OHLC bars equal batch across micro-batches; open/close follow event time, not arrival") {
    // batch 2 delivers an EARLIER event (id 6) than batch 1's — if
    // open were `first` (arrival order) the streamed bar would differ
    val b1 = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 5.0),
      Ev(2, t("2024-01-01T10:04:00Z"), 2, "click", 2.5),
      Ev(3, t("2024-01-01T10:07:00Z"), 1, "click", 9.0))
    val b2 = Seq(
      Ev(6, t("2024-01-01T10:00:30Z"), 3, "click", 1.5), // true open
      Ev(7, t("2024-01-01T10:09:00Z"), 1, "click", 4.0)) // true close
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.ohlcBars(ms.toDF(), "10 minutes").writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val streamed = spark.table(name).collect().toSet
      val batch = Events.ohlcBars((b1 ++ b2).toDF(), "10 minutes").collect().toSet
      assert(streamed === batch)
      val bar = spark.table(name)
        .select("open", "close").as[(Double, Double)].head()
      assert(bar === ((1.5, 4.0)))
    } finally q.stop()
  }

  test("streaming anomaly flags against a static baseline equal the batch scoring") {
    // baseline for (click, hour 10): mean 2.0, std 1.0 → the 9.0 value
    // (z = 7) and the -4.0 (z = -6) flag; 2.5 (z = 0.5) does not
    val baseline = Seq(("click", 10, 2.0, 1.0), ("view", 10, 3.0, 2.0))
      .toDF("event_type", "hod", "mean", "std")
    val b1 = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 9.0),
      Ev(2, t("2024-01-01T10:04:00Z"), 2, "click", 2.5))
    val b2 = Seq(
      Ev(3, t("2024-01-01T10:07:00Z"), 1, "click", -4.0),
      Ev(4, t("2024-01-01T10:08:00Z"), 2, "view", 3.5))
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.anomalyFlags(ms.toDF(), baseline, 2.0).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val streamed = spark.table(name).collect().toSet
      val batch = Events.anomalyFlags((b1 ++ b2).toDF(), baseline, 2.0)
        .collect().toSet
      assert(streamed === batch)
      assert(spark.table(name).select("event_id").as[Long].collect().toSet
        === Set(1L, 3L))
    } finally q.stop()
  }

  test("watermark finalizes windows in append mode and DROPS late rows behind it") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.tumblingWithWatermark(ms.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: two rows in window [10:00,10:10) plus an advancer at
      // 10:20 — AFTER this batch the watermark is 10:20 − 5min = 10:15,
      // which is past the 10:00 window's END (late-drop eligibility is
      // window.end <= watermark, not row.ts <= watermark).
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:04:00Z"), 2, "click", 1.0),
        Ev(3, t("2024-01-01T10:20:00Z"), 3, "click", 1.0)))
      q.processAllAvailable()
      // batch 2 runs with watermark 10:15: the [10:00,10:10) window is
      // finalized with its batch-1 contents, and this batch's late row
      // targeting it is DROPPED; 10:40 advances the watermark further.
      ms.addData(Seq(
        Ev(4, t("2024-01-01T10:01:30Z"), 4, "click", 100.0), // late — must not count
        Ev(5, t("2024-01-01T10:40:00Z"), 5, "click", 1.0)))
      q.processAllAvailable()
      // batch 3: advance watermark past every remaining window end.
      ms.addData(Seq(Ev(6, t("2024-01-01T11:30:00Z"), 6, "click", 1.0)))
      q.processAllAvailable()

      val out = spark.table(name)
        .select("window_start", "n", "sum_value")
        .as[(String, Long, Double)].collect()
        .map { case (k, n, v) => k -> ((n, v)) }.toMap
      // the 10:00 window holds ONLY the two batch-1 rows; the late row's
      // value=100 never lands anywhere.
      assert(out("2024-01-01 10:00:00") === ((2L, 2.0)))
      assert(out("2024-01-01 10:20:00") === ((1L, 1.0)))
      assert(out("2024-01-01 10:40:00") === ((1L, 1.0)))
      assert(!out.values.exists(_._2 >= 100.0), s"late row leaked: $out")
    } finally q.stop()
  }

  test("distinctPerWindow: sketch state merges across micro-batches; estimate exact at test scale") {
    val b1 = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:02:00Z"), 2, "click", 1.0),
      Ev(3, t("2024-01-01T10:03:00Z"), 1, "click", 1.0), // dup user in-batch
      Ev(4, t("2024-01-01T10:04:00Z"), 7, "view", 1.0))
    val b2 = Seq(
      Ev(5, t("2024-01-01T10:06:00Z"), 1, "click", 1.0), // dup user CROSS-batch
      Ev(6, t("2024-01-01T10:07:00Z"), 3, "click", 1.0),
      Ev(7, t("2024-01-01T10:21:00Z"), 1, "click", 1.0)) // next window
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.distinctPerWindow(ms.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val got = spark.table(name)
        .select("window_start", "event_type", "est_users")
        .as[(String, String, Long)].collect().toSet
      // HLL is exact at these cardinalities (sparse mode), so the
      // cross-batch register merge must produce the exact distincts:
      // user 1 counted ONCE in 10:00 despite appearing in both batches
      assert(got === Set(
        ("2024-01-01 10:00:00", "click", 3L), // users 1,2,3
        ("2024-01-01 10:00:00", "view", 1L),
        ("2024-01-01 10:20:00", "click", 1L)))
      // and the emitted sketch BYTES round-trip: estimating them
      // directly equals the streamed estimate column
      val viaBytes = spark.table(name)
        .select(col("window_start"), col("event_type"),
          expr("hll_sketch_estimate(hll)").as("e"))
        .as[(String, String, Long)].collect().toSet
      assert(viaBytes === got)
    } finally q.stop()
  }

  test("quantilesPerWindow: KLL state merges across micro-batches; exact at test scale; bytes round-trip") {
    // 5 values in window 10:00 split ACROSS batches (1,2,3 then 4,5):
    // under capacity the sketch is exact, so the cross-batch buffer
    // merge must produce the exact inclusive order statistics — a
    // wrong/lossy state-store round-trip would corrupt them
    val b1 = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:02:00Z"), 2, "click", 2.0),
      Ev(3, t("2024-01-01T10:03:00Z"), 1, "click", 3.0))
    val b2 = Seq(
      Ev(4, t("2024-01-01T10:06:00Z"), 3, "click", 4.0),
      Ev(5, t("2024-01-01T10:07:00Z"), 4, "click", 5.0),
      Ev(6, t("2024-01-01T10:21:00Z"), 1, "click", 42.0)) // next window
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.quantilesPerWindow(ms.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val got = spark.table(name)
        .select("window_start", "n_values", "p50", "p95")
        .as[(String, Long, Double, Double)].collect()
        .map { case (w, n, a, b) => w -> ((n, a, b)) }.toMap
      // inclusive quantiles over {1..5}: p50 = 3 (rank 0.5 ⇒ 3rd),
      // p95 = 5; the count is exact by the getN contract
      assert(got("2024-01-01 10:00:00") === ((5L, 3.0, 5.0)))
      assert(got("2024-01-01 10:20:00") === ((1L, 42.0, 42.0)))
      // the emitted sketch BYTES round-trip through the memory sink:
      // re-reading the quantile from the bytes equals the column
      val viaBytes = spark.table(name)
        .select(col("window_start"),
          expr("round(graft_kll_quantile(kll, 0.5d), 4)").as("p"))
        .as[(String, Double)].collect().toMap
      assert(viaBytes("2024-01-01 10:00:00") === 3.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: duplicate event_ids within the horizon collapse") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.dedupWithinWatermark(ms.toDF(), "1 hour")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(1, t("2024-01-01T10:00:01Z"), 1, "click", 1.0), // same id, same batch
        Ev(2, t("2024-01-01T10:05:00Z"), 2, "view", 2.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:20:00Z"), 1, "click", 1.0), // dup across batches
        Ev(3, t("2024-01-01T10:21:00Z"), 3, "view", 3.0)))
      q.processAllAvailable()
      val ids = spark.table(name).select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session windows: gap < 1h extends, gap >= 1h splits (batch semantics, q62 shape)") {
    val rows = Seq(
      Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:30:00Z"), 1, "click", 1.0), // 30min gap — same session
      Ev(3, t("2024-01-01T11:31:00Z"), 1, "click", 1.0), // 61min gap — new session
      Ev(4, t("2024-01-01T10:00:00Z"), 2, "view", 5.0))
    val got = Events.sessions(rows.toDF(), "1 hour")
      .select("user_id", "session_start", "n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "2024-01-01 10:00:00", 2L),
      (1L, "2024-01-01 11:31:00", 1L),
      (2L, "2024-01-01 10:00:00", 1L)))
  }

  test("flatMapGroupsWithState: per-user totals accumulate across batches; idle state evicts") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.userRunningTotals(ms.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 2.0),
        Ev(2, t("2024-01-01T10:01:00Z"), 1, "click", 3.0),
        Ev(3, t("2024-01-01T10:02:00Z"), 2, "view", 7.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Ev(4, t("2024-01-01T10:05:00Z"), 1, "click", 5.0))) // user 1 continues
      q.processAllAvailable()
      // watermark jump far past user 2's idle gap → its state times out
      ms.addData(Seq(
        Ev(5, t("2024-01-01T12:00:00Z"), 3, "view", 1.0)))
      q.processAllAvailable()

      val rows = spark.table(name)
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect()
      // batch 1 emitted (1,2,5.0); batch 2 accumulated ONTO it: (1,3,10.0)
      assert(rows.contains((1L, 2L, 5.0)))
      assert(rows.contains((1L, 3L, 10.0)), s"state did not carry across batches: ${rows.toSeq}")
      // user 2's timeout emits its final state once more
      assert(rows.count(_ == ((2L, 1L, 7.0))) === 2, s"idle eviction emit missing: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming debounce: bursts collapse across micro-batches, clock advances on raw events") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.debounce(ms.toDF(), "10 minutes", 600L, "2 hours")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: head kept; +300s dropped; +300s more dropped even
      // though it is 600s after the HEAD (raw events advance the clock)
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "click", 1.0),
        Ev(3, t("2024-01-01T10:10:00Z"), 1, "click", 1.0)))
      q.processAllAvailable()
      // batch 2: the burst clock (10:10) carries ACROSS batches —
      // 10:15 is 300s after it → dropped; 10:30 is 900s → kept.
      // A different type for the same user is its own key → kept.
      ms.addData(Seq(
        Ev(4, t("2024-01-01T10:15:00Z"), 1, "click", 1.0),
        Ev(5, t("2024-01-01T10:30:00Z"), 1, "click", 1.0),
        Ev(6, t("2024-01-01T10:16:00Z"), 1, "view", 1.0)))
      q.processAllAvailable()

      val kept = spark.table(name).select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(kept === Seq(1L, 5L, 6L), s"got $kept")

      // batch ≡ stream on the same (in-order) input, q154's lag rule
      val all = Seq(
        (1L, t("2024-01-01T10:00:00Z"), 1L, "click"),
        (2L, t("2024-01-01T10:05:00Z"), 1L, "click"),
        (3L, t("2024-01-01T10:10:00Z"), 1L, "click"),
        (4L, t("2024-01-01T10:15:00Z"), 1L, "click"),
        (5L, t("2024-01-01T10:30:00Z"), 1L, "click"),
        (6L, t("2024-01-01T10:16:00Z"), 1L, "view"))
        .toDF("event_id", "ts", "user_id", "event_type")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val batchKept = all
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .filter(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") >= 600L)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(batchKept === kept, "stream and batch debounce disagree")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join; unmatched keys keep nulls") {
    val rows = Seq(
      Ev(1, t("2024-01-01T10:01:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:02:00Z"), 2, "click", 2.0),
      Ev(3, t("2024-01-01T10:03:00Z"), 9, "view", 3.0)) // no dim row
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val name = queryName()
    val q = Events.enrichWithStatic(ms.toDF(), dim, "user_id").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select("event_id", "tier").as[(Long, Option[String])].collect().toSet
      val batch = Events.enrichWithStatic(rows.toDF(), dim, "user_id")
        .select("event_id", "tier").as[(Long, Option[String])].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally q.stop()
  }

  /** Total rows across all state stores at the LAST progress that
    * reported state operators — the number the bounded-state claims of
    * the join matrix are pinned on (r13: a doc claim becomes a red
    * test). */
  private def finalStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(ps.nonEmpty, "no progress with state operators recorded")
    ps.last.stateOperators.map(_.numRowsTotal).sum
  }

  test("stream-stream click→purchase join matches within the horizon, state bounded by watermark") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.clickToPurchase(ms.toDF(), delay = "5 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "purchase", 9.0), // within 10 min → match
        Ev(3, t("2024-01-01T10:00:00Z"), 2, "click", 1.0),
        Ev(4, t("2024-01-01T10:30:00Z"), 2, "purchase", 5.0), // 30 min later → no match
        Ev(5, t("2024-01-01T09:55:00Z"), 3, "purchase", 2.0), // BEFORE its click → no match
        Ev(6, t("2024-01-01T10:00:00Z"), 3, "click", 1.0)))
      q.processAllAvailable()
      // advance BOTH sides' watermarks (the event_type filters sit
      // upstream of the withWatermark nodes, so only a click advances
      // the click watermark and only a purchase the purchase one — a
      // 'view' row would advance neither and be dead scaffolding);
      // past-horizon state from batch 1 is then evictable.
      ms.addData(Seq(
        Ev(7, t("2024-01-01T11:00:00Z"), 99, "click", 0.0),
        Ev(8, t("2024-01-01T11:00:00Z"), 98, "purchase", 0.0)))
      q.processAllAvailable()
      val got = spark.table(name)
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got === Set(1L -> 2L))
      // batch equivalence: the same transform over the same rows as a DataFrame
      val rows = Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "purchase", 9.0),
        Ev(3, t("2024-01-01T10:00:00Z"), 2, "click", 1.0),
        Ev(4, t("2024-01-01T10:30:00Z"), 2, "purchase", 5.0),
        Ev(5, t("2024-01-01T09:55:00Z"), 3, "purchase", 2.0),
        Ev(6, t("2024-01-01T10:00:00Z"), 3, "click", 1.0))
      val batch = Events.clickToPurchase(rows.toDF(), "5 minutes", "10 minutes")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(batch === got)
      // STATE-SIZE PIN: 8 rows entered the join; after the 11:00 batch
      // advances both watermarks past every batch-1 row's expiry
      // window, only the two sentinel rows may remain buffered. A
      // bound of 4 leaves slack for store-impl bookkeeping rows while
      // still failing on any real leak (un-evicted batch-1 state).
      assert(finalStateRows(q) <= 4,
        s"join state not bounded by the watermark: ${finalStateRows(q)} rows retained")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER click→purchase: unmatched clicks emit null rows after watermark expiry") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.clickToPurchaseOuter(ms.toDF(), delay = "5 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "purchase", 9.0), // within 10 min → match
        Ev(3, t("2024-01-01T10:00:00Z"), 2, "click", 1.0),
        Ev(4, t("2024-01-01T10:30:00Z"), 2, "purchase", 5.0))) // past horizon → no match
      q.processAllAvailable()
      // before the watermark passes click_ts + horizon + delay, the
      // unmatched click for user 2 must NOT have emitted — the join
      // cannot yet prove no qualifying purchase is still in flight
      val early = spark.table(name)
        .select("click_id", "purchase_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(early === Set(1L -> Some(2L)))
      // push BOTH watermarks far past every click's expiry window;
      // the unmatched click then emits with a null purchase side
      ms.addData(Seq(
        Ev(7, t("2024-01-01T12:00:00Z"), 99, "click", 0.0),
        Ev(8, t("2024-01-01T12:00:00Z"), 98, "purchase", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Ev(9, t("2024-01-01T13:00:00Z"), 99, "click", 0.0),
        Ev(10, t("2024-01-01T13:00:00Z"), 98, "purchase", 0.0)))
      q.processAllAvailable()
      val got = spark.table(name)
        .select("click_id", "purchase_id")
        .as[(Long, Option[Long])].collect().toSet
      // user 1's click matched; user 2's click expired unmatched —
      // the abandonment row the inner join drops
      assert(got.contains(1L -> Some(2L)))
      assert(got.contains(3L -> None),
        s"expected expired unmatched click 3 to emit a null row, got $got")
      // STATE-SIZE PIN: outer-join state must evict exactly like the
      // inner form once null rows have emitted — only the 13:00
      // sentinels may remain
      assert(finalStateRows(q) <= 4,
        s"outer-join state not bounded: ${finalStateRows(q)} rows retained")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER click→purchase: organic purchases emit null-click rows too") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.clickToPurchaseFull(ms.toDF(), delay = "5 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "purchase", 9.0), // matched pair
        Ev(3, t("2024-01-01T10:00:00Z"), 2, "click", 1.0),    // abandoned click
        Ev(4, t("2024-01-01T10:00:00Z"), 3, "purchase", 5.0))) // organic purchase
      q.processAllAvailable()
      // advance both watermarks far past every expiry window (twice —
      // the watermark advances at the NEXT batch boundary)
      ms.addData(Seq(
        Ev(7, t("2024-01-01T12:00:00Z"), 99, "click", 0.0),
        Ev(8, t("2024-01-01T12:00:00Z"), 98, "purchase", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Ev(9, t("2024-01-01T13:00:00Z"), 99, "click", 0.0),
        Ev(10, t("2024-01-01T13:00:00Z"), 98, "purchase", 0.0)))
      q.processAllAvailable()
      val got = spark.table(name)
        .select("click_id", "purchase_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(got.contains(Some(1L) -> Some(2L)), s"matched pair missing: $got")
      assert(got.contains(Some(3L) -> None),
        s"abandoned click must emit null-purchase: $got")
      assert(got.contains(None -> Some(4L)),
        s"organic purchase must emit null-click: $got")
      // STATE-SIZE PIN: full-outer keeps BOTH sides' unmatched rows
      // until expiry — after both have emitted their null rows, state
      // must be back down to the sentinels
      assert(finalStateRows(q) <= 4,
        s"full-outer-join state not bounded: ${finalStateRows(q)} rows retained")
    } finally q.stop()
  }

  test("observe metrics ride the micro-batch: per-batch row/null counters in progress") {
    val ms = MemoryStream[Ev](spark)
    val name = queryName()
    val q = Events.withQualityMetrics(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:05:00Z"), 1, "purchase", 9.0)))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("dq")
      assert(m != null, "dq metrics missing from progress")
      assert(m.getAs[Long]("n_rows") === 2L)
      assert(m.getAs[Long]("n_null_value") === 0L)
      assert(m.getAs[Long]("n_null_user") === 0L)
    } finally q.stop()
  }

  test("foreachBatch report sink: non-empty batch writes an artifact, empty stream writes none") {
    val dir = tmpDir()
    val ms = MemoryStream[Ev](spark)
    ms.addData(Seq(Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0)))
    val q = Events.reportSink(
      Events.tumbling(ms.toDF(), "10 minutes"), dir.toString).start()
    try q.processAllAvailable() finally q.stop()
    assert(Files.exists(dir.resolve("report-0.html")),
      s"missing report artifact in ${Files.list(dir).toArray.mkString(",")}")

    // R12 per batch: an all-filtered (empty) stream leaves NO artifacts.
    val dir2 = tmpDir()
    val ms2 = MemoryStream[Ev](spark)
    ms2.addData(Seq(Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0)))
    val q2 = Events.reportSink(
      Events.tumbling(ms2.toDF().filter(lit(false)), "10 minutes"), dir2.toString).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(!Files.list(dir2).findAny().isPresent,
      "empty batches must not write artifacts")
  }

  test("mergeSink: micro-batches upsert into one snapshot; latest-per-key wins in and across batches") {
    val snap = tmpDir().resolve("snapshot").toString
    val ms = MemoryStream[Ev](spark)
    val q = Events.mergeSink(ms.toDF(), "user_id", "ts", snap).start()
    try {
      // batch 0: two users insert
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:01:00Z"), 2, "click", 2.0)))
      q.processAllAvailable()
      // batch 1: user 2 updated TWICE in one batch (latest ts wins),
      // user 3 inserts, user 1 untouched
      ms.addData(Seq(
        Ev(3, t("2024-01-01T10:05:00Z"), 2, "view", 5.0),
        Ev(4, t("2024-01-01T10:09:00Z"), 2, "purchase", 9.0),
        Ev(5, t("2024-01-01T10:02:00Z"), 3, "click", 3.0)))
      q.processAllAvailable()
      val got = spark.read.parquet(snap)
        .select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(got === Set(
        (1L, "click", 1.0),     // survived untouched
        (2L, "purchase", 9.0),  // in-batch latest, then upserted over batch 0
        (3L, "click", 3.0)))    // inserted
    } finally q.stop()
  }

  test("mergeSink chaos: restart from checkpoint continues; a replayed batch converges") {
    val base = tmpDir()
    val snap = base.resolve("snapshot").toString
    val ckpt = base.resolve("ckpt").toString
    val ms = MemoryStream[Ev](spark)
    // run 1: one batch, then the query is KILLED (stop between batches)
    val q1 = Events.mergeSink(ms.toDF(), "user_id", "ts", snap)
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
        Ev(2, t("2024-01-01T10:01:00Z"), 2, "click", 2.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: NEW query, same source + checkpoint — resumes past the
    // committed batch (no double-apply of batch 0) and applies new data
    val batch1 = Seq(
      Ev(3, t("2024-01-01T10:05:00Z"), 2, "view", 5.0), // user 2 updated
      Ev(4, t("2024-01-01T10:02:00Z"), 3, "click", 3.0)) // user 3 inserts
    val q2 = Events.mergeSink(ms.toDF(), "user_id", "ts", snap)
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(batch1)
      q2.processAllAvailable()
    } finally q2.stop()
    def snapshot(): Set[(Long, String, Double)] =
      spark.read.parquet(snap).select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
    val afterRestart = snapshot()
    assert(afterRestart === Set(
      (1L, "click", 1.0),   // batch 0 survived the restart exactly once
      (2L, "view", 5.0),    // updated by the post-restart batch
      (3L, "click", 3.0)))
    // REPLAY: re-apply the last batch verbatim — precisely what
    // foreachBatch does after a crash between sink commit and offset
    // commit. The merge is idempotent per key ⇒ snapshot unchanged.
    Events.mergeBatch(batch1.toDF(), "user_id", "ts", snap, batchId = 1L)
    assert(snapshot() === afterRestart,
      "replaying a committed batch must converge, not duplicate or regress")
    // and a second replay of the same batch is still a fixpoint
    Events.mergeBatch(batch1.toDF(), "user_id", "ts", snap, batchId = 1L)
    assert(snapshot() === afterRestart)
  }

  test("bloomDedupSink: the sketch carries across batches AND across a restart") {
    val base = tmpDir()
    val out = base.resolve("out").toString
    val sk = base.resolve("sketch").toString
    val ckpt = base.resolve("ckpt").toString
    def kept(batch: Long): Set[Long] =
      spark.read.parquet(s"$out/batch-$batch")
        .select("doc_id").as[Long].collect().toSet
    val ms = MemoryStream[DocRow](spark)
    val q1 = Events.bloomDedupSink(ms.toDF(), "text", 10000L, 0.01, out, sk)
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(DocRow(1, "alpha"), DocRow(2, "beta"))
      q1.processAllAvailable()
      // batch 1 repeats alpha from batch 0 — the cross-batch drop
      ms.addData(DocRow(3, "alpha"), DocRow(4, "gamma"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(kept(0) === Set(1L, 2L))
    assert(kept(1) === Set(4L), "doc 3 repeats batch 0's alpha and must drop")
    // RESTART: new query, same checkpoint — the persisted sketch (not
    // any in-memory state) must still know batch 0/1's content
    val q2 = Events.bloomDedupSink(ms.toDF(), "text", 10000L, 0.01, out, sk)
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(DocRow(5, "beta"), DocRow(6, "delta"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(kept(2) === Set(6L),
      "doc 5 repeats pre-restart content and must drop — sketch survived the restart")
  }

  test("bloomDedupSink chaos: a replayed batch converges (no self-dedup, no dup output)") {
    val base = tmpDir()
    val out = base.resolve("out").toString
    val sk = base.resolve("sketch").toString
    def kept(batch: Long): Set[Long] =
      spark.read.parquet(s"$out/batch-$batch")
        .select("doc_id").as[Long].collect().toSet
    val b0 = Seq(DocRow(1, "a"), DocRow(2, "b")).toDF()
    val b1 = Seq(DocRow(3, "a"), DocRow(4, "c")).toDF()
    Events.bloomDedupBatch(b0, "text", 1000L, 0.01, out, sk, batchId = 0L)
    Events.bloomDedupBatch(b1, "text", 1000L, 0.01, out, sk, batchId = 1L)
    assert(kept(0) === Set(1L, 2L))
    assert(kept(1) === Set(4L))
    // REPLAY batch 1 verbatim (crash between sink commit and offset
    // commit). The strictly-below prior rule must hand it the sketch
    // state from BEFORE batch 1 — a naive "latest sketch" would dedupe
    // the batch against itself and emit nothing.
    Events.bloomDedupBatch(b1, "text", 1000L, 0.01, out, sk, batchId = 1L)
    assert(kept(1) === Set(4L),
      "replaying a batch must converge to the same keep set")
    // and a second replay is still a fixpoint
    Events.bloomDedupBatch(b1, "text", 1000L, 0.01, out, sk, batchId = 1L)
    assert(kept(1) === Set(4L))
    // the chain continues: batch 2 drops content from BOTH earlier
    // batches and the replay didn't corrupt the sketch
    val b2 = Seq(DocRow(5, "b"), DocRow(6, "c"), DocRow(7, "d")).toDF()
    Events.bloomDedupBatch(b2, "text", 1000L, 0.01, out, sk, batchId = 2L)
    assert(kept(2) === Set(7L))
    // pruning kept exactly the replay-reachable generations (1 and 2)
    val fs = new org.apache.hadoop.fs.Path(sk)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(sk))
      .map(_.getPath.getName).filter(_.matches("sketch-\\d+")).toSet
    assert(gens === Set("sketch-1", "sketch-2"))
    // STATE-SIZE PIN: the sink's only state is the sketch file, and a
    // Bloom filter's byte size is a function of (expectedItems, fpp)
    // alone — generation 2 (which has absorbed three batches) must be
    // EXACTLY the size of generation 1, or state grows with data
    val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(sk))
      .filter(_.getPath.getName.matches("sketch-\\d+"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    assert(sizes("sketch-1") === sizes("sketch-2"),
      s"bloom sketch size must be constant across generations: $sizes")
  }

  test("mergeSink chaos: a crash mid-swap (snapshot renamed aside) recovers on replay") {
    val base = tmpDir()
    val snap = base.resolve("snapshot").toString
    def snapshot(): Set[(Long, String, Double)] =
      spark.read.parquet(snap).select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
    // batch 0 commits cleanly
    Events.mergeBatch(Seq(
      Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T10:01:00Z"), 2, "click", 2.0)).toDF(),
      "user_id", "ts", snap, batchId = 0L)
    // batch 1's swap CRASHES between the aside-rename and the
    // rename-into-place: reconstruct that exact on-disk state — the
    // snapshot path absent, the pre-merge state preserved under the
    // aside name for batchId 1 (the worst window of the old
    // delete-then-rename swap, which lost the snapshot here).
    val hp = new org.apache.hadoop.fs.Path(snap)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(hp, new org.apache.hadoop.fs.Path(s"$snap.old-1")))
    assert(!fs.exists(hp))
    // Structured Streaming replays batch 1 after the crash: mergeBatch
    // must restore the aside snapshot first, so user 1 (untouched by
    // batch 1) survives and user 2's update still applies.
    val batch1 = Seq(
      Ev(3, t("2024-01-01T10:05:00Z"), 2, "view", 5.0),
      Ev(4, t("2024-01-01T10:02:00Z"), 3, "click", 3.0))
    Events.mergeBatch(batch1.toDF(), "user_id", "ts", snap, batchId = 1L)
    assert(snapshot() === Set(
      (1L, "click", 1.0),  // pre-crash key recovered from the aside
      (2L, "view", 5.0),   // updated by the replayed batch
      (3L, "click", 3.0))) // inserted by the replayed batch
    // the swap cleaned up after itself: no aside or tmp dirs remain
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$snap.old-1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$snap.tmp-1")))
    // and a clean follow-up batch still merges (schema/column order intact)
    Events.mergeBatch(Seq(
      Ev(5, t("2024-01-01T10:09:00Z"), 1, "purchase", 9.0)).toDF(),
      "user_id", "ts", snap, batchId = 2L)
    assert(snapshot() === Set(
      (1L, "purchase", 9.0), (2L, "view", 5.0), (3L, "click", 3.0)))
  }

  test("streaming FILE source over the events fixture equals the batch q60 result") {
    // the streaming file source consumes a DIRECTORY — stage the single
    // fixture file into one (read-only testdata stays untouched).
    val stage = tmpDir()
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val name = queryName()
    val q = Events.tumbling(
        Events.readStream(spark, stage.toString), "1 day")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(name).collect().toSet
      val batch = Events.tumbling(Tables.events(spark, sfDir), "1 day").collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("batch tumbling on the events fixture equals the streamed fixture (file-source replay)") {
    // Replays the real fixture through the streaming engine: same rows,
    // same transform, complete mode — must equal the batch q60 result.
    val batchDf = Tables.events(spark, sfDir)
    val rows = batchDf.select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val name = queryName()
    val q = Events.tumbling(ms.toDF(), "1 day").writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(name).collect().toSet
      val batch = Events.tumbling(batchDf, "1 day").collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming CUSUM: state composes across micro-batches and equals the batch identity") {
    import graft.stream.MetricPoint
    val k = 10L
    // one drifting key and one quiet key, split across three batches
    val series = Seq(
      ("m1", "2024-01-01T00:00:00Z", 12L), ("m1", "2024-01-02T00:00:00Z", 3L),
      ("m1", "2024-01-03T00:00:00Z", 1L), ("m1", "2024-01-04T00:00:00Z", 25L),
      ("m1", "2024-01-05T00:00:00Z", 30L), ("m1", "2024-01-06T00:00:00Z", 2L),
      ("m1", "2024-01-07T00:00:00Z", 40L), ("m1", "2024-01-08T00:00:00Z", 41L),
      ("m2", "2024-01-01T00:00:00Z", 10L), ("m2", "2024-01-02T00:00:00Z", 9L),
      ("m2", "2024-01-03T00:00:00Z", 11L))
      .map { case (key, ts, c) => MetricPoint(key, t(ts), c) }
    val ms = MemoryStream[MetricPoint](spark)
    val name = queryName()
    // 30-day watermark delay: m2's points all arrive in the LAST
    // batch, after m1 has pushed the watermark to Jan 7 — a tight
    // delay would late-drop them (that path is pinned by the
    // watermark tests above); this test pins state composition.
    val q = Events.cusum(ms.toDS(), k, "30 days", "60 days").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      series.grouped(4).foreach { batch =>
        ms.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table(name)
        .select("key", "ts", "cusum_cents")
        .as[(String, Timestamp, Long)].collect().toSet
      // batch formulation: q213's prefix-min identity per key
      import org.apache.spark.sql.expressions.Window
      val cum = Window.partitionBy("key").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val batch = series.map(p => (p.key, p.ts, p.cents))
        .toDF("key", "ts", "cents")
        .withColumn("p", sum(col("cents") - k).over(cum))
        .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(cum)))
        .select("key", "ts", "s")
        .as[(String, Timestamp, Long)].collect().toSet
      assert(streamed === batch,
        s"stream/batch CUSUM disagree: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
      // the quiet key never accumulates beyond its own small wiggle
      val m2max = streamed.filter(_._1 == "m2").map(_._3).max
      assert(m2max <= 1L)
    } finally q.stop()
  }

  test("leaderboardSink: per-window top-k snapshot updates across batches, ties on user_id") {
    val out = tmpDir().resolve("lb").toString
    val ms = MemoryStream[Ev](spark)
    val q = Events.leaderboardSink(ms.toDF(), "10 minutes", k = 2, out).start()
    try {
      ms.addData(Seq(
        Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 5.0),
        Ev(2, t("2024-01-01T10:01:00Z"), 2, "click", 3.0),
        Ev(3, t("2024-01-01T10:02:00Z"), 3, "click", 1.0),
        Ev(4, t("2024-01-01T10:11:00Z"), 7, "click", 9.0)))
      q.processAllAvailable()
      def snap() = spark.read.parquet(out)
        .select("w_start", "user_id", "total", "rn")
        .as[(java.sql.Timestamp, Long, Double, Int)].collect()
        .map { case (w, u, tot, rn) => (w.toInstant.toString, u, tot, rn) }.toSet
      assert(snap() === Set(
        ("2024-01-01T10:00:00Z", 1L, 5.0, 1), ("2024-01-01T10:00:00Z", 2L, 3.0, 2),
        ("2024-01-01T10:10:00Z", 7L, 9.0, 1)))
      // batch 2: user 3 surges past user 2 in window 1; k=2 cuts user 2
      ms.addData(Seq(Ev(5, t("2024-01-01T10:03:00Z"), 3, "click", 6.0)))
      q.processAllAvailable()
      assert(snap() === Set(
        ("2024-01-01T10:00:00Z", 3L, 7.0, 1), ("2024-01-01T10:00:00Z", 1L, 5.0, 2),
        ("2024-01-01T10:10:00Z", 7L, 9.0, 1)))
    } finally q.stop()
  }

  test("enrichAsOf: events get the dim VERSION valid at event time, not the current one") {
    // user 1: bronze until 10:05, gold after; user 9 has no dim rows
    val dim = Seq(
      (1L, t("2024-01-01T00:00:00Z"), t("2024-01-01T10:05:00Z"), "bronze"),
      (1L, t("2024-01-01T10:05:00Z"), t("2099-01-01T00:00:00Z"), "gold"),
      (2L, t("2024-01-01T00:00:00Z"), t("2099-01-01T00:00:00Z"), "silver"))
      .toDF("user_id", "valid_from", "valid_to", "tier")
    val rows = Seq(
      Ev(1, t("2024-01-01T10:00:00Z"), 1, "click", 1.0), // bronze era
      Ev(2, t("2024-01-01T10:05:00Z"), 1, "click", 1.0), // boundary -> gold (half-open)
      Ev(3, t("2024-01-01T10:10:00Z"), 2, "view", 1.0),  // silver
      Ev(4, t("2024-01-01T10:10:00Z"), 9, "view", 1.0))  // no dim -> null
    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val name = queryName()
    val q = Events.enrichAsOf(ms.toDF(), dim, "user_id", Seq("tier"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select("event_id", "dim_tier").as[(Long, Option[String])].collect().toSet
      assert(streamed === Set(
        1L -> Some("bronze"), 2L -> Some("gold"),
        3L -> Some("silver"), 4L -> None))
      val batch = Events.enrichAsOf(rows.toDF(), dim, "user_id", Seq("tier"))
        .select("event_id", "dim_tier").as[(Long, Option[String])].collect().toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("additive rollup maintenance: stream-maintained == batch-built, replay converges, the rewrite reads it") {
    import java.time.LocalDateTime
    def li(rows: (String, String, Double, Double)*) =
      rows.map { case (d, f, p, disc) =>
        (LocalDateTime.parse(d), f, p, disc)
      }.toDF("l_shipdate", "l_returnflag", "l_extendedprice", "l_discount")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-roll-stream-").toString + "/roll"
    val b0 = li(("1995-01-03T10:00:00", "A", 100.0, 0.1),
      ("1995-01-03T11:00:00", "A", 50.0, 0.0),
      ("1995-01-04T09:00:00", "R", 70.0, 0.2))
    val b1 = li(("1995-01-03T23:00:00", "A", 10.0, 0.0),
      ("1995-01-05T01:00:00", "N", 30.0, 0.5))
    Events.additiveRollupBatch(b0, dir, batchId = 0L)
    Events.additiveRollupBatch(b1, dir, batchId = 1L)
    def snapshot(): Set[(String, String, java.math.BigDecimal, Long)] =
      spark.read.parquet(Events.latestRollup(spark, dir).get)
        .select(col("day").cast("string"), col("l_returnflag"),
          col("rev"), col("cnt"))
        .as[(String, String, java.math.BigDecimal, Long)].collect().toSet
    val got = snapshot()
    // batch-built reference over the SAME rows
    val ref = java.nio.file.Files
      .createTempDirectory("graft-roll-ref-").toString + "/ref"
    graft.pipeline.Warehouse.writeDailyRevenueRollup(b0.unionByName(b1), ref)
    val want = spark.read.parquet(ref)
      .select(col("day").cast("string"), col("l_returnflag"),
        col("rev"), col("cnt"))
      .as[(String, String, java.math.BigDecimal, Long)].collect().toSet
    assert(got === want)
    // crash replay: the SAME batch id re-runs — additive state must
    // NOT double-add (generation discipline: gen-1 recomputed from
    // gen-0, not from itself)
    Events.additiveRollupBatch(b1, dir, batchId = 1L)
    assert(snapshot() === want)
    // and the REWRITE answers from the stream-maintained table: arm
    // the rule at the maintained path over a fake source id, then the
    // canonical whole-table report must read the rollup scan
    spark.conf.set("spark.graft.rollup.daily.path",
      Events.latestRollup(spark, dir).get)
    spark.conf.set("spark.graft.rollup.daily.source",
      "/root/testdata/sf0.001/lineitem.parquet")
    try {
      val report = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .groupBy(col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("rev_d"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
      val plan = report.queryExecution.executedPlan.toString()
      assert(plan.contains("gen-1") && !plan.contains("lineitem.parquet"),
        plan)
      // the maintained table's numbers flow through the rewritten agg
      val out = report.select(col("l_returnflag"), col("n_lines"),
          col("rev_d").cast("string"))
        .as[(String, Long, String)].collect().toSet
      assert(out === Set(("A", 3L, "150.0000"), ("R", 1L, "56.0000"),
        ("N", 1L, "15.0000")))
    } finally {
      spark.conf.unset("spark.graft.rollup.daily.path")
      spark.conf.unset("spark.graft.rollup.daily.source")
    }
  }
}
