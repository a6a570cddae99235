package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2B "Core relational"):
  * scan/project/derive/filter/union/distinct/except/intersect/sort/limit.
  * Generalizes the reference's R5 (projection), R8 (scan), R9 (computed
  * filter — reference: mercadolibre_pipeline_dag.py:75 `price *
  * sold_quantity >= 7000000`), R4 (union-all fold —
  * mercadolibre_pipeline_dag.py:44-45).
  *
  * Scale notes: every query here is a narrow pipeline except the set ops
  * (one shuffle each, unavoidable by semantics) and top-k (planned as
  * TakeOrderedAndProject — per-partition heap, no full sort). Filters and
  * projections are declarative so Catalyst pushes them into the parquet
  * scan (PushedFilters / ReadSchema pruning) — verified in PlanShapeSpec.
  */
object RelationalQueries {

  val queries: Map[String, Q] = Map(
    // incremental MERGE/upsert (pipeline.Ingest.upsert) — the scale
    // successor to R7's snapshot overwrite: updates (keys %100, status
    // 'U', doubled price) win over existing rows, inserts (shifted
    // keys, status 'N') append, everything else survives. Verified
    // through a per-status aggregate of the merged table; the oracle
    // constructs the same merge as a three-way UNION ALL.
    "q91_upsert" -> ((s, dir) => {
      import graft.pipeline.Ingest
      val base = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("U"))
      val inserts = base.filter(col("o_orderkey") % 500 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
      Ingest.upsert(base, updates.unionByName(inserts), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("o_orderstatus")
    }),

    // scan + projection: column pruning must reach the parquet reader.
    "q01_scan_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // R9's computed-predicate filter at TPC-H shape: derive revenue,
    // filter on it. Raw IEEE-754 product — bit-identical in any engine.
    "q02_filter_compute" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .withColumn("revenue", col("l_extendedprice") * col("l_quantity"))
        .filter(col("revenue") >= lit(3000000.0))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "revenue")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // R4's union-all fold, relationally: two disjoint slices reunited.
    // Deliberately written as two filtered scans + union to exercise the
    // unionByName operator shape (the point of the demo); an equivalent
    // single-scan isin("F","P") filter is what a user would write when
    // union itself isn't the operator under test.
    "q03_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F")
      val p = o.filter(col("o_orderstatus") === "P")
      f.unionByName(p)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    "q04_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // EXCEPT: customers that placed an order but are not in BUILDING.
    "q05_except" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      o.except(c).orderBy("custkey")
    }),

    "q06_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      o.intersect(c).orderBy("custkey")
    }),

    // top-k by derived measure: orderBy.limit plans as
    // TakeOrderedAndProject (per-partition heap + single reduce — no
    // global sort, the only top-k that survives 100 TB).
    "q07_topk" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .withColumn("revenue", col("l_extendedprice") * col("l_quantity"))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy(desc("revenue"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // 2-D SKYLINE (ops.TopK.skyline2d): parts on the Pareto frontier
    // of (minimize p_size, maximize p_retailprice) — cheapest-to-ship
    // best-value parts no other part beats on both axes. The DuckDB
    // oracle is the quadratic NOT EXISTS; the Spark side answers from
    // the size-domain group table + one broadcast join (the corpus is
    // scanned once, never self-joined, never globally sorted).
    "q166_skyline" -> ((s, dir) => {
      graft.ops.TopK.skyline2d(
          Tables.part(s, dir).select("p_partkey", "p_size", "p_retailprice"),
          "p_size", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // BAG-SEMANTICS EXCEPT ALL (q05's set EXCEPT keeps one row per
    // surviving key; EXCEPT ALL keeps max(0, n_left − n_right)
    // COPIES — the multiset difference reconciliation needs when
    // "how many are missing" matters, not just "which"). Left side:
    // every order's custkey (multiplicity = order count); right:
    // custkeys of fulfilled orders — the result carries each
    // customer's count of NON-fulfilled orders as row multiplicity.
    // Spark plans exceptAll as a counted anti-difference (groupBy
    // count both sides, subtract, re-expand) — one shuffle per side,
    // no row-by-row matching; the hash gate pins the multiplicities
    // exactly because the compare sorts whole rows.
    "q221_except_all" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val all = o.select(col("o_custkey").as("custkey"))
      val fulfilled = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      all.exceptAll(fulfilled).orderBy("custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    // the INDEPENDENT formulation: textbook dominance NOT EXISTS.
    "q166_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_size <= a.p_size
        |    AND b.p_retailprice >= a.p_retailprice
        |    AND (b.p_size < a.p_size OR b.p_retailprice > a.p_retailprice))
        |ORDER BY p_partkey""".stripMargin,
    "q91_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 100 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 2
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 500 = 0)
        |SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_filter_compute" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_extendedprice * l_quantity AS revenue
        |FROM lineitem WHERE l_extendedprice * l_quantity >= 3000000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_union" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin,
    "q04_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q05_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q06_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q07_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * l_quantity AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    // DuckDB's native multiset EXCEPT ALL — the independent
    // implementation of the counted anti-difference.
    "q221_except_all" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY custkey""".stripMargin,
  )
}
