package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backward as-of join edge cases: latest-preceding match, tie on ts
  * (inclusive), no preceding row (null), key isolation, deterministic
  * pick among duplicated right (key, ts) rows. */
class AsOfSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val left = Seq(
    (1L, "a", 10L), // after r@5 → matches 5
    (2L, "a", 20L), // after r@5, r@20 (tie) → matches 20 (inclusive)
    (3L, "a", 3L),  // before any right row → null
    (4L, "b", 50L), // key isolation: only b's rows
    (5L, "c", 50L), // key with no right rows at all → null
  ).toDF("id", "k", "ts")

  private val right = Seq(
    ("a", 5L, "r5"), ("a", 20L, "r20"), ("a", 30L, "r30"),
    ("b", 49L, "rb"),
  ).toDF("k", "ts", "v")

  test("asofBackward: latest-preceding semantics, inclusive ties, left-outer nulls") {
    val got = AsOf.asofBackward(left, right, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("r5"), 2L -> Some("r20"), 3L -> None,
      4L -> Some("rb"), 5L -> None))
  }

  test("asofBackward preserves left columns and row count") {
    val out = AsOf.asofBackward(left, right, "k", "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "ts", "asof_v"))
    assert(out.count() === left.count())
  }

  test("asofBackward: null keys/timestamps never match (SQL equality semantics)") {
    // Window.partitionBy groups nulls together, so without the right-
    // side null filter a null-key left row would "match" a null-key
    // right row — which `l.key = r.key` in SQL never does.
    val l = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, Option.empty[String], Option(10L)), // null key → no match
      (3L, Option("a"), Option.empty[Long]))   // null ts → no match
      .toDF("id", "k", "ts")
    val r = Seq(
      (Option("a"), Option(5L), "ra"),
      (Option.empty[String], Option(5L), "rnullk"), // unmatched by anyone
      (Option("a"), Option.empty[Long], "rnullts")) // unmatched by anyone
      .toDF("k", "ts", "v")
    val got = AsOf.asofBackward(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> Some("ra"), 2L -> None, 3L -> None))
  }

  test("asofBackward picks the greatest payload among right rows tied on (key, ts)") {
    val dupRight = Seq(("a", 5L, "x"), ("a", 5L, "z"), ("a", 5L, "y"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofBackward(left.filter(col("id") === 1), dupRight,
        "k", "ts", Seq("v"))
      .select("asof_v").as[String].head()
    assert(got === "z") // max payload struct — deterministic
  }

  test("asofForward: earliest-following semantics, inclusive ties, left-outer nulls") {
    val got = AsOf.asofForward(left, right, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("r20"), // earliest right >= 10
      2L -> Some("r20"), // tie on ts matches (inclusive)
      3L -> Some("r5"),  // earliest right >= 3
      4L -> None,        // b's only right row is at 49 < 50
      5L -> None))       // key with no right rows
  }

  test("asofForward picks the greatest payload among right rows tied on (key, ts)") {
    val dupRight = Seq(("a", 50L, "x"), ("a", 50L, "z"), ("a", 50L, "y"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofForward(left.filter(col("id") === 1), dupRight,
        "k", "ts", Seq("v"))
      .select("asof_v").as[String].head()
    assert(got === "z")
  }

  test("asofForward ≡ independent range join + min_by on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"))
    val viaAsof = AsOf.asofForward(clicks, purchases.withColumnRenamed("p_user", "user_id")
        .withColumnRenamed("p_ts", "ts"), "user_id", "ts", Seq("p_event"))
      .select(col("event_id"), col("asof_p_event"))
      .as[(Long, Option[Long])].collect().toMap
    val viaJoin = clicks
      .join(purchases, col("user_id") === col("p_user") && col("p_ts") >= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(min_by(col("p_event"), struct(col("p_ts"), negate(col("p_event")))).as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaAsof === viaJoin)
  }

  test("asofBackward matches DuckDB ASOF semantics on the events fixture shape") {
    // cross-check the q75 pipeline against an independent Spark
    // implementation: per click, the max-ts purchase with ts <= click.ts
    // via a range join + max_by aggregation.
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"))
    val viaAsof = AsOf.asofBackward(clicks, purchases.withColumnRenamed("p_user", "user_id")
        .withColumnRenamed("p_ts", "ts"), "user_id", "ts", Seq("p_event"))
      .select(col("event_id"), col("asof_p_event"))
      .as[(Long, Option[Long])].collect().toMap
    val viaJoin = clicks
      .join(purchases, col("user_id") === col("p_user") && col("p_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("p_event"), struct(col("p_ts"), col("p_event"))).as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaAsof === viaJoin)
  }

  test("asofNearest: closest match either direction, distance ties prefer backward, nulls preserved") {
    import org.apache.spark.sql.DataFrame
    def tsify(df: DataFrame) = df.withColumn("ts", timestamp_micros(col("ts")))
    val l = tsify(Seq(
      (1L, "a", 10L), // b@5 dist 5, f@20 dist 10 -> backward r5
      (2L, "a", 18L), // b@5 dist 13, f@20 dist 2 -> forward r20
      (3L, "a", 25L), // b@20 dist 5, f@30 dist 5 -> TIE -> backward r20
      (4L, "a", 3L),  // nothing before -> forward r5
      (5L, "c", 50L)  // no right rows at all -> null
    ).toDF("id", "k", "ts"))
    val r = tsify(Seq(
      ("a", 5L, "r5"), ("a", 20L, "r20"), ("a", 30L, "r30")
    ).toDF("k", "ts", "v"))
    val got = AsOf.asofNearest(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> Some("r5"), 2L -> Some("r20"),
      3L -> Some("r20"), 4L -> Some("r5"), 5L -> None))
    // output schema: left columns + prefixed value, internals dropped
    val out = AsOf.asofNearest(l, r, "k", "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "ts", "asof_v"))
    assert(out.count() === l.count())
  }
}
