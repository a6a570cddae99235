package graft.queries

import graft.{Q, Tables}
import graft.pipeline.Ingest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference ingest pipeline's COMPUTE (R2-R5) under the driver's
  * hash gate (reference: mercadolibre_pipeline_dag.py:27-59 — per-
  * category search payloads, `["results"]` extraction, flatten,
  * 6-column projection). The fetch itself stays honestly stubbed
  * (sources/ApiSource — no egress in this container), but everything
  * AFTER the bytes arrive is gated here: per-category payload JSON is
  * assembled deterministically from the `part` fixture (the stand-in
  * product catalog), pushed through `Ingest.normalize` /
  * `Ingest.quarantine`, and the DuckDB oracle recomputes the expected
  * rows RELATIONALLY — no JSON on the oracle side — so any drift in
  * the from_json schema, the explode/flatten, the projection, or the
  * quarantine predicate hash-mismatches.
  *
  * Scale notes: payload assembly is one groupBy on the small category
  * key; normalize itself is the production-relevant path and stays
  * fully narrow (parse → explode → project, zero shuffle) — at 100 TB
  * it scales with input splits, which is the reference DAG's serial
  * per-category loop re-expressed (SURVEY.md §3 EP1).
  */
object PipelineQueries {

  /** Per-category search payloads from the part table: category =
    * p_partkey % 10, each payload `{"results":[<product objects>]}`
    * via to_json. Categories with `cat % corruptMod == corruptRem`
    * get a MALFORMED payload (`{corrupt:<cat>`) instead — the planted
    * drift that normalize must drop and quarantine must capture. */
  private def categoryPayloads(s: SparkSession, dir: String,
                               corruptMod: Int, corruptRem: Int): DataFrame =
    Tables.part(s, dir)
      .select((col("p_partkey") % 10).as("cat"),
        struct(
          col("p_partkey").cast("string").as("id"),
          concat(lit("site_"), col("p_partkey") % 3).as("site_id"),
          col("p_name").as("title"),
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("sold_quantity"),
          concat(lit("http://img/"), col("p_partkey")).as("thumbnail")).as("r"))
      .groupBy(col("cat"))
      .agg(collect_list(col("r")).as("results"))
      .select(
        when(col("cat") % corruptMod === corruptRem,
          concat(lit("{corrupt:"), col("cat")))
          .otherwise(to_json(struct(col("results")))).as("payload"))

  val queries: Map[String, Q] = Map(
    // R3+R4+R5 end to end: payload JSON → from_json(declared schema) →
    // explode(results) → 6-column projection. One planted-corrupt
    // category (cat 7) must contribute ZERO rows (PERMISSIVE parse →
    // null results → explode emits nothing). The oracle projects the
    // same columns straight from `part`, excluding cat 7 — if the
    // parse/flatten/projection drifts (field rename, missed row, type
    // coercion), the hash mismatches. created_date (R6) is
    // current_timestamp and is deliberately not selected.
    "q97_ingest_normalize" -> ((s, dir) => {
      Ingest.normalize(categoryPayloads(s, dir, corruptMod = 10, corruptRem = 7),
          "payload")
        .select(col("id"), col("site_id"), col("title"), col("price"),
          col("sold_quantity"), col("thumbnail"))
        .orderBy("id")
    }),

    // Z-ORDER layout key (Warehouse.zOrderKey): Morton-interleave
    // (l_partkey, l_suppkey) — the multi-dimensional data-skipping
    // sort key. The KEY ARITHMETIC is what's gated here (bit fold,
    // engine-portable); the layout payoff (both dims' per-file spans
    // narrow under a z sort, vs one dim under a plain sort) is
    // measured in WarehouseSpec on this same fixture.
    "q126_zorder_key" -> ((s, dir) => {
      import graft.pipeline.Warehouse
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          Warehouse.zOrderKey(col("l_partkey"), col("l_suppkey"), 16)
            .as("z_key"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Quarantine capture, content-addressed: categories 1/4/7 carry
    // malformed payloads; the quarantine filter (parsed results IS
    // NULL on a non-null payload) must capture EXACTLY those three —
    // verified by md5 of the raw quarantined payloads, so capturing a
    // healthy payload (or missing a corrupt one) mismatches.
    "q98_ingest_quarantine" -> ((s, dir) => {
      Ingest.quarantine(categoryPayloads(s, dir, corruptMod = 3, corruptRem = 1),
          "payload")
        .select(md5(col("raw_payload")).as("payload_md5"))
        .orderBy("payload_md5")
    }),

    // SNAPSHOT RECONCILIATION DIFF (Ingest.tableDiff): two derived
    // snapshot versions of orders (old = keys %7≠0; new = keys %5≠0
    // with price bumped on %3=0) classified added / removed / changed
    // via ONE full-outer key join with null-safe change detection over
    // every non-key column. Unchanged rows — the overwhelming bulk in
    // a real diff — are dropped before the sink. The oracle replays
    // the same derivation + full join relationally.
    "q150_snapshot_diff" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val oldSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      Ingest.tableDiff(oldSnap, newSnap, "o_orderkey")
        .filter(col("diff_status") =!= "unchanged")
        .orderBy("o_orderkey")
    }),

    // RENDEZVOUS-HASH SHARD REBALANCING (Warehouse.rendezvousShard —
    // HRW/consistent hashing): every document's shard under 8 and
    // under 9 shards, with its moved flag. The operational claim under
    // the gate: growing the shard set moves ~1/9 of keys (vs ~8/9
    // under mod-hashing), and every mover lands ON the new shard —
    // WarehouseSpec asserts both; here the full assignment is
    // cross-engine bit-checked (md5 argmax, row-local, zero shuffle).
    "q158_rendezvous_shards" -> ((s, dir) => {
      import graft.pipeline.Warehouse
      val s8 = Warehouse.rendezvousShard(col("doc_id"), 8)
      val s9 = Warehouse.rendezvousShard(col("doc_id"), 9)
      Tables.documents(s, dir)
        .select(col("doc_id"), s8.as("shard_before"), s9.as("shard_after"),
          (s8 =!= s9).as("moved"))
        .orderBy("doc_id")
    }),

    // INCREMENTAL ALGEBRAIC AGGREGATE MAINTENANCE (Ingest.aggState /
    // mergeAggState — the q134 sketch-table discipline applied to the
    // aggregates that need no sketch): per-customer count/sum/min/max
    // state over history (orderdate < 1995-06-01) is built, WRITTEN to
    // parquet, read back in a fresh plan, and merged with the fresh
    // batch's partials — full-history answers with only the batch
    // rescanned. Decimal sums make state∘merge bit-equal to the
    // single-pass oracle (which recomputes over ALL orders — so a
    // lossy merge, a dropped key, or a decimal→double shortcut
    // hash-mismatches). avg derives at read time: sum/cnt in double,
    // identical arithmetic both engines.
    "q151_agg_maintenance" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val cut = lit("1995-06-01").cast("date")
      val hist = Ingest.aggState(
        orders.filter(col("o_orderdate") < cut), "o_custkey", "o_totalprice")
      val path = graft.TempDirs.scratch("graft-aggstate-") + "/state"
      hist.write.mode("overwrite").parquet(path)
      val stored = s.read.parquet(path)
      val batch = Ingest.aggState(
        orders.filter(col("o_orderdate") >= cut), "o_custkey", "o_totalprice")
      Ingest.mergeAggState(stored, batch, "o_custkey")
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum").cast("double").as("total_price"),
          col("mn").as("min_price"), col("mx").as("max_price"),
          (col("sum").cast("double") / col("cnt")).as("avg_price"))
        .orderBy("o_custkey")
    }),

    // INCREMENTAL JOIN-VIEW MAINTENANCE (Ingest.joinViewDelta): both
    // lineitem and orders arrive in 3 key-split batches; each step
    // appends ΔM = ΔL⋈R_acc ∪ L_acc⋈ΔR ∪ ΔL⋈ΔR to the persisted
    // view and the deltas to the persisted accumulators. Because the
    // delta algebra produces every cross-batch pair exactly once, the
    // read-back view must equal the one-shot join — which is exactly
    // the plain-join DuckDB oracle, so batch-split invariance is what
    // the hash match proves (q99/q151 lineage). Aggregated per
    // orderstatus to keep the gated payload small; PipelineSpec pins
    // the row-level equality. The two sides are split by UNRELATED
    // criteria (key residue vs order month) so every one of the three
    // delta terms carries real rows — a same-key split would make the
    // cross-batch terms vacuously empty and prove nothing.
    "q167_join_view" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val ords = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"),
          col("o_orderdate"))
      val base = graft.TempDirs.scratch("graft-ivm-")
      val (mPath, lPath, rPath) = (base + "/view", base + "/lacc", base + "/racc")
      for (i <- 0 to 2) {
        val dL = li.filter(col("l_orderkey") % 3 === i)
        val dR = ords.filter(month(col("o_orderdate")) % 3 === i)
          .drop("o_orderdate")
        val (lAcc, rAcc) =
          if (i == 0) (dL.limit(0), dR.limit(0))
          else (s.read.parquet(lPath), s.read.parquet(rPath))
        Ingest.joinViewDelta(lAcc, rAcc, dL, dR, "l_orderkey")
          .write.mode("append").parquet(mPath)
        dL.write.mode("append").parquet(lPath)
        dR.write.mode("append").parquet(rPath)
      }
      s.read.parquet(mPath)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // COMPACTION / SHARD-PACKING PLAN (the small-files remedy at the
    // planning layer — q133's partitioned-write fix prevents the
    // trap at write time; this is the operator that REPAIRS an
    // already-fragmented table, the Warehouse.shardAssign idea
    // driven by SIZE instead of count): pack each source's documents,
    // in deterministic doc_id order, into target-sized output bins
    // via the START-OFFSET rule bin = (running_size − own_size) div
    // target — the streaming first-fit every compaction service
    // runs. One window per source partition (file-count-sized, not
    // byte-sized rows), one groupBy for the per-bin manifest; no
    // driver-side packing loop. Oversized single docs land alone in
    // their own bin (start-offset still within the previous bin's
    // overflow — the documented greedy semantics). The manifest —
    // not the rewritten bytes — is the deliverable: the rewrite job
    // reads it and streams each bin's members.
    // SAMPLED RANGE-SPLIT PLANNER (what Spark's RangePartitioner and
    // every sort-based table layout do internally, made explicit and
    // gated): draw a ~2% CONTENT-ADDRESSED sample (the q76/q124 md5
    // coin — partition-invariant, replayable, never rand()), cut k−1
    // boundaries at the sample's evenly-spaced order statistics, then
    // assign the FULL table and audit the balance the sample promised.
    // The boundary ranks come from Sampling.rankedByRange — two-phase
    // range rank (range-partition, per-partition row_number, windowless
    // broadcast offsets), so NO single-partition WindowExec exists in
    // the plan even over the sample (the r12 seam, closed; PlanShapeSpec
    // pins it and SamplingSpec pins rank ≡ the global window form).
    // Assignment is bucket = Σ[v ≥ boundary] over the (k−1)-row
    // broadcast — a bounded-fan-out broadcast join standing in for the
    // binary-search array probe a native expression would do. Skew
    // column = per-bucket rows ÷ ideal; this is the number a layout
    // service alerts on.
    "q273_range_split_planner" -> ((s, dir) => {
      val k = 16
      val li = Tables.lineitem(s, dir).select(
        round(col("l_extendedprice"), 2).cast("decimal(18,2)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
      // floor(0.02 · 16^6) = 335544 = 0x051eb8
      val coin = substring(md5(concat(col("l_orderkey").cast("string"),
        lit(":"), col("l_linenumber").cast("string"), lit(":rs"))), 1, 6)
      val sample = li.filter(coin < lit("051eb8"))
      val sm = sample.agg(count(lit(1)).as("m"))
      val targets = sm.select(explode(sequence(lit(1), lit(k - 1))).as("j"),
          col("m"))
        // integer `div`, not `/`+cast: Spark's long cast truncates
        // where DuckDB's BIGINT cast rounds — `div` ≡ `//` exactly
        .select(expr(s"(m * j) div $k").as("rn"))
      val bounds = graft.ops.Sampling
        .rankedByRange(sample, Seq("v", "l_orderkey", "l_linenumber"), 16)
        .join(broadcast(targets), Seq("rn"))
        .select(col("v").as("b"))
      val assigned = li.join(broadcast(bounds), col("v") >= col("b"), "left")
        .groupBy(col("l_orderkey"), col("l_linenumber"), col("v"))
        .agg(count(col("b")).as("bucket"))
      val total = li.agg(count(lit(1)).as("n_total"))
      assigned.groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          round(min("v").cast("double"), 2).as("lo"),
          round(max("v").cast("double"), 2).as("hi"))
        .crossJoin(broadcast(total))
        .select(col("bucket"), col("n_rows"), col("lo"), col("hi"),
          round(col("n_rows").cast("double") * lit(k.toDouble) /
            col("n_total").cast("double"), 4).as("skew"))
        .orderBy("bucket")
    }),

    "q218_compaction_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 2000L
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("running", sum(col("n_chars")).over(w))
        .withColumn("bin", expr(s"(running - n_chars) div ${target}L"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bin_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    }),

    // REFERENTIAL-INTEGRITY AUDIT (the FK-orphan sweep — q146's
    // constraint audit covers single-table invariants; this is the
    // CROSS-table half every warehouse runs nightly): one row per
    // declared FK edge of the star schema with child row count and
    // orphan count (children whose parent key is absent). Each edge
    // is a LEFT ANTI join aggregated to a count — anti joins
    // broadcast their parent side when small and never materialize
    // matches. The fixture is referentially clean by construction —
    // asserting zero IS the audit — so one edge is also checked
    // against a DAMAGED parent snapshot (every 97th order removed,
    // deterministic) to keep the nonzero reporting path under the
    // gate (q146's deliberately-failing-check discipline).
    "q223_fk_orphans" -> ((s, dir) => {
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String): DataFrame = {
        val orphans = child.join(parent.select(col(pk)),
          col(ck) === col(pk), "left_anti")
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"))
      }
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      edge("lineitem.orderkey->orders", li, "l_orderkey", ord, "o_orderkey")
        .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        .unionByName(edge("orders.custkey->customer", ord, "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .unionByName(edge("customer.nationkey->nation",
          Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey"))
        .unionByName(edge("lineitem.orderkey->orders[damaged]", li,
          "l_orderkey", ord.filter(col("o_orderkey") % 97 =!= 0),
          "o_orderkey"))
        .orderBy("fk")
    }),

    // ZONE-MAP EFFECTIVENESS AUDIT (the data-skipping planner's
    // what-if — q126 builds the z-order layout; this MEASURES what a
    // layout buys): lineitem is binned into 1000-row "files" under
    // two layouts — shipdate-SORTED vs natural (orderkey, linenumber)
    // arrival order — each file keeps its (min, max) shipdate zone
    // map, and a representative one-month predicate counts prunable
    // files (max < lo OR min >= hi). Sorted layout prunes nearly
    // everything; arrival order prunes nothing — the measured
    // argument for sort-before-write at 100 TB, where a pruned file
    // is IO that never happens. row_number is the file assigner
    // (deterministic total orders both engines replay); integer/
    // timestamp compares only. The unpartitioned row_number is the
    // SIMULATION's device, not the operator's production shape: real
    // zone maps come from parquet footers (file-count-sized
    // metadata), and a production what-if reads those, never
    // re-ranks the data (q124's global-rank-funnel rule stands).
    "q224_zonemap_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      val lo = lit("1996-01-01").cast("timestamp_ntz")
      val hi = lit("1996-02-01").cast("timestamp_ntz")
      def audit(layout: String, ordered: org.apache.spark.sql.Column*) = {
        val w = Window.orderBy(ordered: _*)
        li.withColumn("rn", row_number().over(w))
          .withColumn("file_id", expr("(rn - 1) div 1000"))
          .groupBy(col("file_id"))
          .agg(min(col("l_shipdate")).as("zmin"),
            max(col("l_shipdate")).as("zmax"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("zmax") < lo || col("zmin") >= hi, 1L)
              .otherwise(0L)).as("n_pruned"))
          .select(lit(layout).as("layout"), col("n_files"), col("n_pruned"))
      }
      audit("shipdate_sorted", col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
        .unionByName(audit("arrival_order", col("l_orderkey"),
          col("l_linenumber")))
        .orderBy("layout")
    }),

    // Z-ORDER READ-BACK (q224's what-if made REAL, and q126's key
    // arithmetic put to work): lineitem lands in a parquet table
    // PARTITIONED BY its z-cell — both join keys min/max-scaled to
    // 3 bits each, Morton-interleaved into 64 directory cells — and
    // the gated query READS THE TABLE BACK with a predicate on BOTH
    // dimensions, recovered by DE-interleaving the partition column
    // (even bits → partkey bucket, odd bits → suppkey bucket). The
    // de-interleave is a deterministic expression over the partition
    // column alone, so Catalyst folds it into PartitionFilters and
    // the 2D rectangle scans only its ≤16-of-64 qualifying
    // directories — zero data files opened outside the rectangle
    // (pinned in WarehouseSpec) — the property a single-column sort
    // cannot give both dimensions at once. The min/max bounds ride a
    // one-row bounded collect so the filter is a LITERAL predicate
    // (statically prunable, no subquery). The oracle replays bucket,
    // interleave, and rectangle relationally — layout-free — so the
    // hash match proves the partitioned round trip loses nothing and
    // the de-interleave picks exactly the rectangle. Scale shape:
    // the write is one narrow scan fanned across 64 dirs; the read
    // is partition-pruned IO ∝ the rectangle's share of cells.
    // SCHEMA-EVOLUTION READ (r16; the pipeline reality every lake hits
    // — an old parquet generation lacks columns a new one carries):
    // generation A (doc_id % 2 = 0) is written with the ORIGINAL
    // 3-column schema, generation B with two more columns (source +
    // n_chars); `mergeSchema=true` reads both under the union schema
    // with generation-A rows NULL-filled. The gated per-lang rollup
    // counts non-null coverage of the evolved columns — the oracle
    // simulates the generations with CASE over the original parquet,
    // so the hash match proves merge + null-fill exact (coverage ≈
    // half per lang, both generations live, inspected). Scale: the
    // merged read stays two narrow scans; schema union is metadata.
    "q360_schema_evolution" -> ((s, dir) => {
      val base = graft.TempDirs.scratch("graft-evolve-")
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").parquet(s"$base/gen_a")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").parquet(s"$base/gen_b")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen_a", s"$base/gen_b")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNotNull, 1L).otherwise(0L))
            .as("n_with_source"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars_new_gen"))
        .orderBy("lang")
    }),

    // FORWARD-FILL IMPUTATION (r16; the cleaning op beside q199's
    // winsorize and the ingest quarantine — time-series gap repair):
    // per-user last-observation-carried-forward over (ts, event_id)
    // total order via `last(value, ignoreNulls)` over the per-key
    // running frame (AsOf.scala's own kernel, surfaced as a gated
    // operator). The fixture's value column has ZERO nulls (checked —
    // the first cut's missing/ffilled/still-missing columns all read
    // 0, the vacuous-branch audit), so gaps are PLANTED with the
    // md5-coin (1-in-7 events lose their value, q344's discipline).
    // Per-user audit out: events, missing, ffilled (missing with a
    // prior observation), still-missing (leading nulls — honestly NOT
    // repairable by LOCF; fires for users whose first events are
    // gapped), and an exact integer cents checksum of the imputed
    // series (round(v·100) per row, summed) that the oracle
    // recomputes via SQL IGNORE NULLS — the hash match pins fill
    // VALUES, not just counts. Window is per-user partitioned;
    // nothing global.
    "q361_impute_ffill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("value", when(
          conv(substring(md5(concat(lit("gap:"),
            col("event_id").cast("string"))), 1, 4), 16, 10)
            .cast("long") % 7 === 0, lit(null)).otherwise(col("value")))
        .withColumn("ff", last(col("value"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_missing"),
          sum(when(col("value").isNull && col("ff").isNotNull, 1L)
            .otherwise(0L)).as("n_ffilled"),
          sum(when(col("ff").isNull, 1L).otherwise(0L))
            .as("n_still_missing"),
          sum(round(coalesce(col("ff"), lit(0.0)) * 100, 0).cast("long"))
            .as("imputed_cents"))
        .orderBy("user_id")
    }),

    // JSONL SOURCE ROUND-TRIP (r16; the semi-structured export/ingest
    // leg of the source family beside the DSv2 ApiSource and the
    // parquet/bucketed/z-order sinks): documents → newline-delimited
    // JSON (spark.write.json) → re-ingest with SCHEMA INFERENCE →
    // aggregate. The gated output includes an order-free integrity
    // checksum (Σ over docs of the first-8-hex md5(text) as integer)
    // computed from the ROUND-TRIPPED rows while the DuckDB oracle
    // computes it from the ORIGINAL parquet — the hash match proves
    // the JSON writer/parser pair loses nothing (escapes, unicode,
    // long text) AND that inference recovers the numeric column as an
    // integer type. Scale shape: both legs are narrow scans; the
    // aggregate is a (lang × source)-bounded rollup.
    "q355_jsonl_roundtrip" -> ((s, dir) => {
      val path = graft.TempDirs.scratch("graft-jsonl-") + "/docs"
      Tables.documents(s, dir).write.mode("overwrite").json(path)
      s.read.json(path)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long")).as("text_checksum"))
        .orderBy("lang", "source")
    }),

    // CSV SOURCE ROUND-TRIP (r16; the delimited-text leg — header,
    // quoting, and the classic DATE round-trip): typed orders subset →
    // CSV with header → re-ingest under an EXPLICIT schema (long /
    // string / double / date) → aggregate. Revenue re-quantized to
    // DECIMAL(18,2) after the double→text→double trip (Spark prints
    // round-trip-safe shortest-repr doubles, so the cents are exact),
    // date bounds ride ISO strings. The oracle replays from the
    // original parquet — the hash match proves the CSV pair loses
    // neither numerics nor dates.
    "q356_csv_roundtrip" -> ((s, dir) => {
      val path = graft.TempDirs.scratch("graft-csv-") + "/orders"
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("o_day"))
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read
        .schema("o_orderkey LONG, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, o_day DATE")
        .option("header", "true").csv(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          min(col("o_day")).cast("string").as("first_day"),
          max(col("o_day")).cast("string").as("last_day"))
        .orderBy("o_orderstatus")
    }),

    "q253_zorder_readback" -> ((s, dir) => {
      import graft.pipeline.Warehouse
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          round(col("l_extendedprice"), 2).cast("decimal(18,2)").as("price"))
      val b = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      val (minP, maxP, minS, maxS) =
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      val pb = expr(s"((l_partkey - $minP) * 8) div ${maxP - minP + 1}")
      val sb = expr(s"((l_suppkey - $minS) * 8) div ${maxS - minS + 1}")
      val path = graft.TempDirs.scratch("graft-zorder-") + "/table"
      li.withColumn("zcell", Warehouse.zOrderKey(pb, sb, 3))
        .write.mode("overwrite").partitionBy("zcell").parquet(path)
      val back = s.read.parquet(path)
      // partition-column-only de-interleave: bit i of pb is z's bit
      // 2i, of sb z's bit 2i+1 (zOrderKey's exact inverse)
      val pbOf = expr("zcell % 2 + ((zcell div 4) % 2) * 2 + " +
        "((zcell div 16) % 2) * 4")
      val sbOf = expr("(zcell div 2) % 2 + ((zcell div 8) % 2) * 2 + " +
        "((zcell div 32) % 2) * 4")
      back.filter(pbOf.between(2, 5) && sbOf.between(2, 5))
        .groupBy(col("zcell").cast("bigint").as("zcell"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price")).cast("double").as("revenue"))
        .orderBy("zcell")
    }),

    // HOT-KEY SKEW PROFILER (the diagnostic you run BEFORE choosing
    // between AQE skew-join and manual salting — ops/Skew's scaladoc
    // decision needs these numbers): for each candidate join key of
    // the fact table, the group-size distribution — key count, max
    // and p99 group size, mean, and the hottest key itself (max by
    // (count, key) struct — deterministic tie-break). Each column is
    // one partial-agg-combined groupBy to a key-sized table, then a
    // one-row rollup; the q29 percentile runs over group SIZES (key-
    // cardinality input, not rows). Fan the columns as a union of
    // three narrow single-column scans — column pruning gives each
    // branch a one-column read.
    "q235_hotkey_profile" -> ((s, dir) => {
      def profile(keyCol: String): DataFrame = {
        val counts = Tables.lineitem(s, dir)
          .groupBy(col(keyCol).as("k"))
          .agg(count(lit(1)).as("cnt"))
        counts.agg(
            count(lit(1)).as("n_keys"),
            sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("max_group"),
            expr("round(percentile(cnt, 0.99), 4)").as("p99_group"),
            max(struct(col("cnt"), col("k"))).as("hot"))
          .select(lit(keyCol).as("key_col"), col("n_keys"), col("n_rows"),
            col("max_group"), col("p99_group"),
            col("hot.k").as("hottest_key"))
      }
      profile("l_orderkey")
        .unionByName(profile("l_partkey"))
        .unionByName(profile("l_suppkey"))
        .orderBy("key_col")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q273_range_split_planner" ->
      """WITH li AS (
        |  SELECT CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS v,
        |         l_orderkey, l_linenumber
        |  FROM lineitem),
        |sample AS (
        |  SELECT * FROM li
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |          CAST(l_linenumber AS VARCHAR) || ':rs'), 1, 6) < '051eb8'),
        |sm AS (SELECT count(*) AS m FROM sample),
        |targets AS (
        |  SELECT CAST(m * t.range // 16 AS BIGINT) AS rn
        |  FROM sm CROSS JOIN range(1, 16) t),
        |ranked AS (
        |  SELECT v, CAST(row_number() OVER
        |    (ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM sample),
        |bounds AS (SELECT v AS b FROM ranked JOIN targets USING (rn)),
        |assigned AS (
        |  SELECT li.l_orderkey, li.l_linenumber, li.v,
        |         CAST(count(b.b) AS BIGINT) AS bucket
        |  FROM li LEFT JOIN bounds b ON li.v >= b.b
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT count(*) AS n_total FROM li)
        |SELECT bucket, count(*) AS n_rows,
        |       round(CAST(min(v) AS DOUBLE), 2) AS lo,
        |       round(CAST(max(v) AS DOUBLE), 2) AS hi,
        |       round(CAST(count(*) AS DOUBLE) * 16.0
        |             / CAST(n_total AS DOUBLE), 4) AS skew
        |FROM assigned CROSS JOIN tot
        |GROUP BY bucket, n_total ORDER BY bucket""".stripMargin,
    // the same start-offset rule in DuckDB's window dialect.
    "q218_compaction_plan" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS running
        |  FROM documents)
        |SELECT source, CAST((running - n_chars) // 2000 AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM r GROUP BY source, bin
        |ORDER BY source, bin""".stripMargin,
    // each FK edge as NOT IN-style anti counts; the damaged edge
    // filters the parent the same deterministic way.
    "q223_fk_orphans" ->
      """SELECT 'lineitem.orderkey->orders' AS fk,
        |       (SELECT count(*) FROM lineitem) AS n_rows,
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |         AS n_orphans
        |UNION ALL
        |SELECT 'lineitem.partkey->part',
        |       (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |         (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'lineitem.suppkey->supplier',
        |       (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |         (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |UNION ALL
        |SELECT 'orders.custkey->customer',
        |       (SELECT count(*) FROM orders),
        |       (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'customer.nationkey->nation',
        |       (SELECT count(*) FROM customer),
        |       (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |UNION ALL
        |SELECT 'lineitem.orderkey->orders[damaged]',
        |       (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        |            AND o.o_orderkey % 97 <> 0))
        |ORDER BY fk""".stripMargin,
    // the same two simulated layouts under DuckDB's row_number.
    "q224_zonemap_audit" ->
      """WITH s AS (
        |  SELECT l_shipdate,
        |         (row_number() OVER (ORDER BY l_shipdate, l_orderkey,
        |            l_linenumber) - 1) // 1000 AS file_id
        |  FROM lineitem),
        |a AS (
        |  SELECT l_shipdate,
        |         (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
        |           // 1000 AS file_id
        |  FROM lineitem),
        |sz AS (
        |  SELECT file_id, min(l_shipdate) AS zmin, max(l_shipdate) AS zmax
        |  FROM s GROUP BY 1),
        |az AS (
        |  SELECT file_id, min(l_shipdate) AS zmin, max(l_shipdate) AS zmax
        |  FROM a GROUP BY 1)
        |SELECT 'shipdate_sorted' AS layout,
        |       CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(CASE WHEN zmax < TIMESTAMP '1996-01-01'
        |                       OR zmin >= TIMESTAMP '1996-02-01'
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
        |FROM sz
        |UNION ALL
        |SELECT 'arrival_order', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN zmax < TIMESTAMP '1996-01-01'
        |                       OR zmin >= TIMESTAMP '1996-02-01'
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |FROM az
        |ORDER BY layout""".stripMargin,
    // bucket, interleave, and rectangle replayed relationally — no
    // layout, no partitioning — so the gate proves the partitioned
    // round trip + de-interleaved rectangle equals the plain filter.
    // the generations simulated with CASE over the original parquet —
    // equality proves merge + null-fill exact
    "q360_schema_evolution" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_with_source,
        |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
        |         AS BIGINT) AS sum_chars_new_gen
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the same LOCF via SQL IGNORE NULLS — fill VALUES pinned by the
    // cents checksum, not just counts
    "q361_impute_ffill" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN CAST(('0x' || substr(md5('gap:' || event_id),
        |                1, 4)) AS BIGINT) % 7 = 0
        |              THEN NULL ELSE value END AS value
        |  FROM events),
        |f AS (
        |  SELECT user_id, value,
        |         last_value(value IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
        |  FROM g)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_missing,
        |       CAST(sum(CASE WHEN value IS NULL AND ff IS NOT NULL
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_ffilled,
        |       CAST(sum(CASE WHEN ff IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_still_missing,
        |       CAST(sum(CAST(round(coalesce(ff, 0.0) * 100) AS BIGINT))
        |         AS BIGINT) AS imputed_cents
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    // computed from the ORIGINAL parquet — equality proves the JSON
    // writer/parser round trip lossless
    "q355_jsonl_roundtrip" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |         AS BIGINT) AS text_checksum
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // from the original parquet — equality proves the CSV pair loses
    // neither numerics nor dates
    "q356_csv_roundtrip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |         AS DOUBLE) AS revenue,
        |       CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_day,
        |       CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_day
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q253_zorder_readback" ->
      """WITH kb AS (
        |  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
        |         min(l_suppkey) AS mins, max(l_suppkey) AS maxs
        |  FROM lineitem),
        |b AS (
        |  SELECT ((l_partkey - minp) * 8) // (maxp - minp + 1) AS pb,
        |         ((l_suppkey - mins) * 8) // (maxs - mins + 1) AS sb,
        |         CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS price
        |  FROM lineitem CROSS JOIN kb),
        |z AS (
        |  SELECT pb % 2 + 2 * (sb % 2) + 4 * ((pb // 2) % 2)
        |         + 8 * ((sb // 2) % 2) + 16 * ((pb // 4) % 2)
        |         + 32 * ((sb // 4) % 2) AS zcell, pb, sb, price
        |  FROM b)
        |SELECT CAST(zcell AS BIGINT) AS zcell,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(price) AS DOUBLE) AS revenue
        |FROM z WHERE pb BETWEEN 2 AND 5 AND sb BETWEEN 2 AND 5
        |GROUP BY zcell ORDER BY zcell""".stripMargin,
    // the same three per-key distributions; hottest key by the
    // independent row_number pick.
    "q235_hotkey_profile" ->
      """WITH p AS (
        |  SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
        |  UNION ALL
        |  SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL
        |  SELECT 'l_suppkey', l_suppkey FROM lineitem),
        |c AS (
        |  SELECT key_col, k, CAST(count(*) AS BIGINT) AS cnt
        |  FROM p GROUP BY 1, 2),
        |r AS (
        |  SELECT key_col, k, cnt,
        |         row_number() OVER (PARTITION BY key_col
        |           ORDER BY cnt DESC, k DESC) AS pick
        |  FROM c)
        |SELECT c.key_col,
        |       CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(cnt) AS BIGINT) AS n_rows,
        |       CAST(max(cnt) AS BIGINT) AS max_group,
        |       round(quantile_cont(cnt, 0.99), 4) AS p99_group,
        |       max(CASE WHEN pick = 1 THEN k END) AS hottest_key
        |FROM r c GROUP BY c.key_col
        |ORDER BY key_col""".stripMargin,
    // the one-shot join the incremental view must reproduce exactly.
    "q167_join_view" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // same floor-div bit fold; every intermediate is integral and
    // < 2^53, so the double arithmetic is exact in both engines.
    "q126_zorder_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       CAST(list_sum(list_transform(range(0, 16), i ->
        |         (CAST(floor(l_partkey / 2 ** i) AS BIGINT) % 2
        |          + 2 * (CAST(floor(l_suppkey / 2 ** i) AS BIGINT) % 2))
        |         * (4 ** i))) AS BIGINT) AS z_key
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // relational recomputation — the oracle never parses JSON, so the
    // Spark-side parse path is what is actually under test.
    "q97_ingest_normalize" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS id,
        |       'site_' || (p_partkey % 3) AS site_id,
        |       p_name AS title,
        |       p_retailprice AS price,
        |       CAST(p_size AS BIGINT) AS sold_quantity,
        |       'http://img/' || p_partkey AS thumbnail
        |FROM part
        |WHERE p_partkey % 10 <> 7
        |ORDER BY id""".stripMargin,
    "q98_ingest_quarantine" ->
      """SELECT md5('{corrupt:' || cat) AS payload_md5
        |FROM (SELECT DISTINCT p_partkey % 10 AS cat FROM part
        |      WHERE (p_partkey % 10) % 3 = 1) t
        |ORDER BY payload_md5""".stripMargin,
    // IS NOT DISTINCT FROM = the null-safe <=> over every non-key col.
    "q150_snapshot_diff" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |n AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
        |                  ELSE o_totalprice END AS o_totalprice,
        |             o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |            WHEN n.o_orderkey IS NULL THEN 'removed'
        |            WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |             AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |             AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        |             AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
        |             AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
        |            THEN 'unchanged' ELSE 'changed' END AS diff_status
        |FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        |           AND o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |           AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |           AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        |           AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
        |           AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    // same md5-argmax; h8 is a prefix of h9, so the moved flag is the
    // pure growth delta.
    "q158_rendezvous_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 8),
        |      s -> md5(doc_id::VARCHAR || ':' || s)) AS h8,
        |    list_transform(range(0, 9),
        |      s -> md5(doc_id::VARCHAR || ':' || s)) AS h9
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_position(h8, list_aggregate(h8, 'max')) - 1 AS INT)
        |    AS shard_before,
        |  CAST(list_position(h9, list_aggregate(h9, 'max')) - 1 AS INT)
        |    AS shard_after,
        |  list_position(h8, list_aggregate(h8, 'max'))
        |    <> list_position(h9, list_aggregate(h9, 'max')) AS moved
        |FROM h ORDER BY doc_id""".stripMargin,
    // single-pass full recompute — the state∘merge lifecycle must be
    // invisible against it.
    "q151_agg_maintenance" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
  )
}
