package graft.queries

import graft.{Q, Tables}
import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2B "Window functions"): ranking,
  * analytic lag/lead, running aggregates with ROWS and RANGE frames.
  *
  * Scale notes: a window over `partitionBy(k)` shuffles once on k then
  * sorts within partitions — same cost envelope as a groupBy on k. The
  * anti-pattern at 100 TB is a window with NO partitionBy (single-task
  * global sort); none of these do that. Window order keys always extend
  * to a unique tuple so results are deterministic under ties.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    // top-3 orders per customer by value: ranking + filter on rank.
    "q30_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // running sum per supplier over ship order (ROWS frame).
    // l_quantity is integer-valued → exact in double at any sum order.
    // The window order MUST be total for a ROWS frame: the synthetic
    // lineitem does NOT have unique (l_orderkey, l_linenumber) —
    // sf0.1 contains one full tie on (suppkey, shipdate, orderkey,
    // linenumber), which made the running sum engine- and
    // run-nondeterministic until l_partkey extended the key.
    "q31_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // lag/lead analytics per customer over order date.
    "q32_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // grouped top-k through the ops.TopK seam (window form; TopKSpec's
    // viaAgg≡viaWindow equivalence extends this oracle to the
    // bounded-heap Aggregator that wins the shuffle-volume race at
    // 100 TB). Ties broken by ascending id — deterministic.
    "q34_grouped_topk" -> ((s, dir) => {
      TopK.viaWindow(Tables.orders(s, dir),
          groupCol = "o_custkey", orderCol = "o_totalprice",
          idCol = "o_orderkey", k = 2)
        .orderBy("o_custkey", "o_orderkey")
    }),

    // grouped top-k through the BOUNDED-HEAP AGGREGATOR (TopK.viaAgg) —
    // the variant that wins at 100 TB (the shuffle carries at most
    // k·groups·partitions (score, id) pairs instead of every row). Same
    // grouping as q34, so the same row_number SQL oracles BOTH paths:
    // the Aggregator's descending-score / ascending-id tie-break is
    // deterministic, making this a full hash-match gate, not rows-only.
    // The ONE intentional typed Aggregator in a declared query — it
    // plans as ObjectHashAggregate (partial+final pinned in
    // PlanShapeSpec), not as the scala_udf node the no-UDF guard bans.
    "q95_topk_agg" -> ((s, dir) => {
      TopK.viaAgg(Tables.orders(s, dir),
          groupCol = "o_custkey", orderCol = "o_totalprice",
          idCol = "o_orderkey", k = 2)
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE frame on a numeric ordering column: peers (equal keys) are
    // included together — semantics identical across engines.
    "q33_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"))
        .rangeBetween(-10L, Window.currentRow)
      Tables.lineitem(s, dir)
        .withColumn("qty_in_range", sum(col("l_quantity")).over(w))
        .select("l_returnflag", "l_orderkey", "l_linenumber", "qty_in_range")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    }),

    // TIME-RANGE rolling aggregate — q33's frame family applied to
    // event time: per user, for every event, the count and mean value
    // over the trailing hour (RANGE BETWEEN 3599 PRECEDING AND CURRENT
    // ROW on floor-epoch-seconds, so same-second peers land in one
    // frame identically in both engines). Decimal-summed then ONE
    // double division — frame content is a set, so no float-order
    // sensitivity. One user_id shuffle; the frame is evaluated with a
    // sliding two-pointer over each sorted partition, NOT a per-row
    // rescan.
    "q118_rolling_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("es"))
        .rangeBetween(-3599L, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("es", col("ts").cast("long"))
        .withColumn("n_hour", count(lit(1)).over(w))
        .withColumn("sum_hour",
          sum(col("value").cast("decimal(18,2)")).over(w))
        .select(col("event_id"), col("user_id"), col("es"),
          col("n_hour"),
          (col("sum_hour").cast("double") / col("n_hour").cast("double"))
            .as("avg_hour"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q30_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q31_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       sum(l_quantity) OVER (PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q32_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       lag(o_totalprice, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |       lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q34_grouped_topk" ->
      """SELECT o_custkey, o_totalprice, o_orderkey FROM (
        |  SELECT o_custkey, o_totalprice, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin,
    // q95 = q34's semantics through the Aggregator path; o_totalprice
    // and o_orderkey pass through viaAgg as double/bigint, which are
    // their native types already — no casts needed on the SQL side.
    "q95_topk_agg" ->
      """SELECT o_custkey, o_totalprice, o_orderkey FROM (
        |  SELECT o_custkey, o_totalprice, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q33_window_range" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |       sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_orderkey
        |         RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS qty_in_range
        |FROM lineitem ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    // trailing-hour frame on floor-epoch-seconds (epoch_us // 1e6 ≡
    // Spark's timestamp→long cast); decimal window sum ÷ count.
    "q118_rolling_avg" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         epoch_us(ts) // 1000000 AS es
        |  FROM events)
        |SELECT event_id, user_id, es,
        |       count(*) OVER w AS n_hour,
        |       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |            / CAST(count(*) OVER w AS DOUBLE) AS DOUBLE) AS avg_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
  )
}
