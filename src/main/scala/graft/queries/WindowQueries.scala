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
        .withColumn("rn", row_number().over(w).cast("bigint"))
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

    // grouped top-k through the WHOLE-OPERATOR seam (plans.GroupedTopK
    // — LogicalPlan + Rule + Strategy + SparkPlan): the query is the
    // PLAIN declarative window idiom; in any graft session the
    // optimizer re-plans it as the heap-based GroupedTopKExec (no
    // sorts, no WindowExec — GroupedTopKPlanSpec pins the plan and the
    // row-for-row equivalence), and the DuckDB oracle replays the
    // window form — so the hash gate proves the custom physical
    // operator against an independent engine, ranks included. Total
    // order key (price desc, orderkey, linenumber) makes ranks
    // deterministic; rn rides as BIGINT (the r12 int32 rule).
    "q287_grouped_topk_planned" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy(desc("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"),
          round(col("l_extendedprice"), 2).as("price"),
          col("l_orderkey"), col("l_linenumber").cast("long").as("lnum"),
          col("rn").cast("long").as("rn"))
        .orderBy("l_suppkey", "rn")
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

    // ARGMIN VIA SINGLE-SHUFFLE AGGREGATION: the cheapest supplier per
    // part as min(struct(price, suppkey)) — ONE map-side-combined
    // groupBy shuffle carrying one struct per (partition, part),
    // where the window top-1 form (q34's shape at k=1) sorts and
    // shuffles EVERY row. The struct's field order IS the tie-break
    // (price, then suppkey) — deterministic. The oracle is the
    // row_number formulation, an independent algorithm, so the hash
    // match proves argmin-by-struct ≡ window-top-1.
    "q153_argmin_supplier" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("best"))
        .select(col("l_partkey"),
          col("best.l_suppkey").as("best_suppkey"),
          col("best.l_extendedprice").as("best_price"))
        .orderBy("l_partkey")
    }),

    // EVENT DEBOUNCE (burst collapse): keep an event only when the
    // SAME (user, type) has been quiet for >= 600 s — telemetry
    // retry/double-fire suppression. A burst extends while inter-event
    // gaps stay under the threshold (islands semantics, exactly
    // q114's gap rule scoped per type), so a chain 0s/300s/600s keeps
    // only its head. One (user_id, event_type) shuffle; gap compare on
    // floor-epoch-seconds in both engines (q114 precedent).
    "q154_debounce" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .filter(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") >= 600L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("event_id")
    }),

    // PER-GROUP PERCENTILE-RANK NORMALIZATION: n_chars → [0,1] within
    // each language — the score-normalization pass mixture/curriculum
    // builders run before comparing quality across languages (q105's
    // decile binning is this at coarse grain). Ordering is made TOTAL
    // with the id tie-break, so rank = row_number and percent_rank is
    // the exact integer ratio (rank−1)/(n−1) in both engines. One
    // lang shuffle.
    "q155_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      Tables.documents(s, dir)
        .withColumn("pr", round(percent_rank().over(w), 6))
        .select("doc_id", "lang", "n_chars", "pr")
        .orderBy("doc_id")
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

    // ANALYTIC-FUNCTION surface completion (r13): the four ranking/
    // distribution analytics q30–q33 didn't cover — ntile (equi-count
    // tiling with the standard first-(n mod k)-tiles-get-one-extra
    // rule), percent_rank, cume_dist, nth_value — all over ONE
    // supplier-partitioned total-order window, folded to a per-
    // supplier summary row (tile price cuts, the largest percent_rank
    // in the first quartile, the median-crossing cume_dist, the
    // third-lowest price). Every analytic is an exact small-integer
    // fraction or a picked value — deterministic under the total
    // order, replayed verbatim by the oracle.
    "q313_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("tile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("third", nth_value(col("l_extendedprice"), 3).over(wf))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          round(max(when(col("tile") === 1, col("l_extendedprice"))), 2).as("t1_hi"),
          round(max(when(col("tile") === 2, col("l_extendedprice"))), 2).as("t2_hi"),
          round(max(when(col("tile") === 3, col("l_extendedprice"))), 2).as("t3_hi"),
          round(max(when(col("pr") <= 0.25, col("pr"))), 6).as("pr_q1"),
          round(min(when(col("cd") >= 0.5, col("cd"))), 6).as("cd_median"),
          round(max(col("third")), 2).as("third_lowest"))
        .orderBy("l_suppkey")
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

    // MONTH-OVER-MONTH TRENDING RANK (the leaderboard-movement
    // query — "top parts this month and where they ranked last
    // month"): per (ship-month, part) quantity off one
    // partial-agg-combined groupBy, rank within month (exact
    // decimal quantities — float sums would make adjacent ranks a
    // coin flip), then the PREVIOUS month's rank arrives by joining
    // the rank table to itself on (part, month−1) — months become
    // INTEGER ids (year·12+month) so the shift is plain integer
    // arithmetic, no calendar type coercion. Everything rides the
    // (month, part)-sized rank table, never lineitem, and the
    // previous rank arrives by a SECOND WINDOW — lag over the
    // part's own month sequence, kept only when that month is
    // exactly month−1 — instead of a rank-table self-join: the
    // naive join recomputes the whole groupBy+rank pipeline for
    // its second input (measured 5.3 s → 1.9 s at sf0.1), while
    // the lag is one more shuffle of the rank table. The prev side
    // is unfiltered ranks, so an item can fall INTO the top 5 from
    // rank 40 (filtering before the lookback is the classic bug);
    // the DuckDB oracle keeps the independent self-join
    // formulation, so the hash match proves the lag rewrite exact.
    "q225_trending" -> ((s, dir) => {
      // quantities as integer HUNDREDTHS (long), not decimal: the
      // rank sort key is compared ~n log n times per month
      // partition and long compares are radix-friendly where
      // decimal compares are not — same exact arithmetic.
      val m = Tables.lineitem(s, dir)
        .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .as("month_id"),
          col("l_partkey"))
        .agg(sum((round(col("l_quantity"), 2).cast("decimal(18,2)") * 100)
          .cast("long")).as("qty_c"))
      val w = Window.partitionBy("month_id")
        .orderBy(desc("qty_c"), col("l_partkey"))
      val byPart = Window.partitionBy("l_partkey").orderBy("month_id")
      m.withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("prev", lag(struct(col("month_id"), col("rnk")), 1)
          .over(byPart))
        .filter(col("rnk") <= 5)
        .select(col("month_id"), col("l_partkey"),
          (col("qty_c").cast("double") / 100.0).as("qty"), col("rnk"),
          when(col("prev.month_id") === col("month_id") - 1,
            col("prev.rnk")).as("prev_rank"))
        .orderBy("month_id", "rnk", "l_partkey")
    }),

    // LONGEST GROWTH STREAK per nation (gaps-and-islands on a
    // CONDITION run — q173 finds islands of PRESENCE, this finds
    // islands of month-over-month GROWTH, the "N consecutive
    // quarters of growth" screen): monthly revenue per customer
    // nation, growth flag vs lag, then the rn − running-sum-of-
    // flags trick — constant within each consecutive growth run —
    // groups the islands without a join. Exact cents make the
    // growth comparison engine-exact; every window rides the
    // (nation × month)-sized rollup, never the orders.
    "q227_growth_streaks" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("month_id"))
        .agg(sum((round(col("o_totalprice"), 2).cast("decimal(18,2)") * 100)
          .cast("long")).as("rev_cents"))
      val seq0 = Window.partitionBy("c_nationkey").orderBy("month_id")
      val flagged = monthly
        .withColumn("prev_rev", lag(col("rev_cents"), 1).over(seq0))
        .withColumn("g",
          when(col("prev_rev").isNotNull &&
            col("rev_cents") > col("prev_rev"), 1L).otherwise(0L))
        .withColumn("rn", row_number().over(seq0))
        .withColumn("grp", col("rn") - sum(col("g")).over(
          seq0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.filter(col("g") === 1)
        .groupBy(col("c_nationkey"), col("grp"))
        .agg(count(lit(1)).as("len"), max(col("month_id")).as("streak_end"))
        .groupBy(col("c_nationkey"))
        .agg(max(struct(col("len"), col("streak_end"))).as("best"))
        .select(col("c_nationkey"), col("best.len").as("longest_streak"),
          col("best.streak_end").as("streak_end_month"))
        .orderBy("c_nationkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q287_grouped_topk_planned" ->
      """SELECT l_suppkey, round(l_extendedprice, 2) AS price,
        |       l_orderkey, CAST(l_linenumber AS BIGINT) AS lnum,
        |       CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey,
        |                    l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    // the INDEPENDENT window-top-1 formulation of the argmin aggregate
    "q153_argmin_supplier" ->
      """SELECT l_partkey, l_suppkey AS best_suppkey,
        |       l_extendedprice AS best_price FROM (
        |  SELECT l_partkey, l_suppkey, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_partkey
        |           ORDER BY l_extendedprice, l_suppkey) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_partkey""".stripMargin,
    "q154_debounce" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM (
        |  SELECT event_id, user_id, event_type, ts,
        |         lag(ts) OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts, event_id) AS prev_ts
        |  FROM events) t
        |WHERE prev_ts IS NULL
        |   OR epoch_us(ts) // 1000000 - epoch_us(prev_ts) // 1000000 >= 600
        |ORDER BY event_id""".stripMargin,
    // total order via the id tie-break ⇒ rank = row_number and
    // percent_rank is an exact integer ratio in both engines
    "q155_percent_rank" ->
      """SELECT doc_id, lang, n_chars,
        |       round(percent_rank() OVER (PARTITION BY lang
        |         ORDER BY n_chars, doc_id), 6) AS pr
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "q313_window_analytics" ->
      """WITH t AS (
        |  SELECT l_suppkey, l_extendedprice,
        |         ntile(4) OVER w AS tile,
        |         percent_rank() OVER w AS pr,
        |         cume_dist() OVER w AS cd,
        |         nth_value(l_extendedprice, 3) OVER
        |           (PARTITION BY l_suppkey
        |            ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |            ROWS BETWEEN UNBOUNDED PRECEDING
        |                     AND UNBOUNDED FOLLOWING) AS third
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_extendedprice, l_orderkey, l_linenumber))
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |       round(max(CASE WHEN tile = 1 THEN l_extendedprice END), 2) AS t1_hi,
        |       round(max(CASE WHEN tile = 2 THEN l_extendedprice END), 2) AS t2_hi,
        |       round(max(CASE WHEN tile = 3 THEN l_extendedprice END), 2) AS t3_hi,
        |       round(max(CASE WHEN pr <= 0.25 THEN pr END), 6) AS pr_q1,
        |       round(min(CASE WHEN cd >= 0.5 THEN cd END), 6) AS cd_median,
        |       round(max(third), 2) AS third_lowest
        |FROM t GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
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
    // same integer month ids, same decimal quantities, prev side
    // unfiltered.
    "q225_trending" ->
      """WITH m AS (
        |  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS INTEGER)
        |           AS month_id,
        |         l_partkey,
        |         sum(CAST(CAST(round(l_quantity, 2) AS DECIMAL(18,2)) * 100
        |             AS BIGINT)) AS qty_c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT month_id, l_partkey, qty_c,
        |         CAST(rank() OVER (PARTITION BY month_id
        |           ORDER BY qty_c DESC, l_partkey) AS BIGINT) AS rnk
        |  FROM m)
        |SELECT c.month_id, c.l_partkey,
        |       CAST(c.qty_c AS DOUBLE) / 100.0 AS qty,
        |       c.rnk, p.rnk AS prev_rank
        |FROM r c LEFT JOIN r p
        |  ON p.month_id = c.month_id - 1 AND p.l_partkey = c.l_partkey
        |WHERE c.rnk <= 5
        |ORDER BY c.month_id, c.rnk, c.l_partkey""".stripMargin,
    // same islands trick; the per-nation winner picked by the
    // independent row_number formulation instead of the struct max.
    "q227_growth_streaks" ->
      """WITH m AS (
        |  SELECT c_nationkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER)
        |           AS month_id,
        |         sum(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))
        |             * 100 AS BIGINT)) AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT c_nationkey, month_id, rev_cents,
        |         CASE WHEN lag(rev_cents) OVER w IS NOT NULL
        |                AND rev_cents > lag(rev_cents) OVER w
        |              THEN 1 ELSE 0 END AS g,
        |         row_number() OVER w AS rn
        |  FROM m
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY month_id)),
        |f2 AS (
        |  SELECT c_nationkey, month_id, g,
        |         rn - sum(g) OVER (PARTITION BY c_nationkey ORDER BY month_id
        |           ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM f),
        |i AS (
        |  SELECT c_nationkey, grp, month_id FROM f2 WHERE g = 1),
        |s AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS len,
        |         max(month_id) AS streak_end
        |  FROM i GROUP BY c_nationkey, grp),
        |b AS (
        |  SELECT c_nationkey, len, streak_end,
        |         row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY len DESC, streak_end DESC) AS pick
        |  FROM s)
        |SELECT c_nationkey, len AS longest_streak,
        |       streak_end AS streak_end_month
        |FROM b WHERE pick = 1
        |ORDER BY c_nationkey""".stripMargin,
  )
}
