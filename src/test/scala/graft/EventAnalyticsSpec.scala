package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pins the batch event-analytics operators (q112–q115) on hand-built
  * event logs where the expected answer is computable by eye:
  * funnel stage ordering (out-of-order stages must NOT count),
  * retention week offsets, the exact 30-minute session boundary, and
  * transition-probability normalization. The DuckDB oracles check the
  * same semantics against the fixture; these cases pin the corners the
  * generated data may not exercise.
  */
class EventAnalyticsSpec extends AnyFunSuite with SparkFixture {

  private val base = 1704067200L // 2024-01-01 00:00:00 UTC (a Monday)

  /** Writes rows (event_id, secondsFromBase, user_id, event_type, value)
    * as an events.parquet matching the fixture encoding (int64 nanos),
    * returns the dir for EventQueries to read via Tables.events. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TempDirs.scratch("graft-evspec-")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, secs, uid, typ, v) =>
      Row(id, (base + secs) * 1000000000L, uid, typ, v, "{}")
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
        schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    graft.queries.EventQueries.queries(name)(spark, dir)

  test("q112 funnel: stages count only when strictly ordered") {
    val dir = eventsDir(Seq(
      // user 1: full ordered funnel → stage 4
      (1L, 0L, 1L, "signup", 1.0), (2L, 10L, 1L, "view", 1.0),
      (3L, 20L, 1L, "click", 1.0), (4L, 30L, 1L, "purchase", 1.0),
      // user 2: view BEFORE signup, none after → stage 1
      (5L, 0L, 2L, "view", 1.0), (6L, 10L, 2L, "signup", 1.0),
      (7L, 20L, 2L, "click", 1.0),
      // user 3: never signed up → stage 0 despite activity
      (8L, 0L, 3L, "click", 1.0), (9L, 10L, 3L, "purchase", 1.0),
      // user 4: signup→view→purchase, click missing → stage 2
      (10L, 0L, 4L, "signup", 1.0), (11L, 10L, 4L, "view", 1.0),
      (12L, 20L, 4L, "purchase", 1.0)))
    val got = run("q112_funnel", dir)
      .select("user_id", "stage").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 4, 2L -> 1, 3L -> 0, 4L -> 2))
  }

  test("q113 retention: cohort week and offsets from first-event week") {
    val wk = 7L * 86400L
    val dir = eventsDir(Seq(
      // user 1: first event week 0, active weeks 0 and 2
      (1L, 0L, 1L, "view", 1.0), (2L, 2 * wk + 3600L, 1L, "view", 1.0),
      // user 2: first event week 1, active week 1 only
      (3L, wk + 60L, 2L, "click", 1.0)))
    val got = run("q113_retention", dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), ("2024-01-08", 0, 1L)))
  }

  test("q114 gap sessions: 1799 s gap merges, exactly 1800 s splits") {
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 1799L, 1L, "view", 2.0),   // gap 1799 < 1800 → same session
      (3L, 3599L, 1L, "view", 4.0)))  // gap 1800 → NEW session
    val got = run("q114_gap_sessions", dir)
      .select("session_seq", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 3.0), (2L, 1L, 4.0)))
  }

  test("q115 transitions: counts per ordered pair, p sums to 1 per src") {
    val dir = eventsDir(Seq(
      // user 1: a→b→a ; user 2: a→c  (types relabeled to fixture names)
      (1L, 0L, 1L, "view", 1.0), (2L, 10L, 1L, "click", 1.0),
      (3L, 20L, 1L, "view", 1.0),
      (4L, 0L, 2L, "view", 1.0), (5L, 10L, 2L, "error", 1.0)))
    val rows = run("q115_transitions", dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(("view", "click")) === ((1L, 0.5)))
    assert(rows(("view", "error")) === ((1L, 0.5)))
    assert(rows(("click", "view")) === ((1L, 1.0)))
    val bySrc = rows.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    bySrc.foreach { case (_, p) => assert(math.abs(p - 1.0) < 1e-12) }
  }

  test("q213's prefix-min identity equals the literal sequential CUSUM fold") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // series with a dip below zero, a flat stretch, and a drift burst
    // (k = 10): exercises the reset (max-with-0) and the no-reset tail
    val xs = Seq(12L, 3L, 1L, 25L, 30L, 2L, 40L, 41L, 5L, 9L)
    val k = 10L
    val expected = xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail
    val cum = Window.orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
      .withColumn("p", sum(col("x") - k).over(cum))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(cum)))
      .orderBy("i").select("s").as[Long].collect().toSeq
    assert(got === expected)
  }
}
