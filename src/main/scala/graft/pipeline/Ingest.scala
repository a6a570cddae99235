package graft.pipeline

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingest pipeline R1-R7, Spark-native
  * (reference: mercadolibre_pipeline_dag.py:18-65 — HTTP fetch per
  * category, json.loads, list-concat flatten, 6-column projection,
  * constant load timestamp, snapshot load with if_exists="replace").
  *
  * Spark redesign: the per-category payloads arrive as ROWS of raw JSON
  * strings (one per fetch — in production a DataSource or a driver-side
  * fetch into createDataFrame; in tests literal fixtures). Everything
  * downstream is a single NARROW pipeline: from_json → explode →
  * project → timestamp → write. No shuffle anywhere — at 100 TB this
  * scales linearly with input splits.
  *
  * Schemas are DECLARED, never inferred (SURVEY.md §1.3): the reference
  * lets pandas/SQLAlchemy infer column types from payload values, which
  * silently drifts when the API changes; `from_json` against an
  * explicit schema makes drift a visible null instead.
  */
object Ingest {

  /** Search-response payload shape (R2 — reference :33 takes only
    * `["results"]`): an object whose `results` field is an array of
    * wide product objects. Only the projected fields are declared —
    * from_json ignores the rest, mirroring the reference's projection
    * (R5) at parse time so undeclared fields are never materialized. */
  val searchPayloadSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(Tables.productSchema))))

  /** R3+R4+R5+R6: raw payload strings → typed product rows.
    * Corrupt payloads (from_json → null) and empty result arrays both
    * contribute zero rows — `explode` of null/empty emits nothing,
    * which is exactly the reference's list-concat behavior for an empty
    * category. */
  def normalize(payloads: DataFrame, payloadCol: String): DataFrame =
    payloads
      .select(from_json(col(payloadCol), searchPayloadSchema).as("p")) // R3
      .select(explode(col("p.results")).as("r"))                      // R4
      .select(                                                         // R5
        col("r.id").as("id"),
        col("r.site_id").as("site_id"),
        col("r.title").as("title"),
        col("r.price").as("price"),
        col("r.sold_quantity").as("sold_quantity"),
        col("r.thumbnail").as("thumbnail"))
      .withColumn("created_date", current_timestamp())                 // R6

  /** Corrupt-payload quarantine: rows whose payload is unparseable OR
    * lacks the `results` field (PERMISSIVE from_json yields an
    * all-null struct for malformed input, so the null `results` field
    * — never null for a conforming payload, `[]` at worst — is the
    * drift signal). The reference silently drops malformed payloads
    * (json.loads would throw and kill the task); at 100 TB a pipeline
    * must keep them — schema drift shows up HERE first, and quarantine
    * row counts are the alert. Pair with `normalize`: good rows flow
    * on, these land in a side table. */
  def quarantine(payloads: DataFrame, payloadCol: String): DataFrame =
    payloads
      .withColumn("__parsed", from_json(col(payloadCol), searchPayloadSchema))
      .filter(col(payloadCol).isNotNull && col("__parsed.results").isNull)
      .select(col(payloadCol).as("raw_payload"),
        current_timestamp().as("quarantined_at"))

  /** R7: snapshot load — full overwrite, the reference's
    * if_exists="replace" idempotency story (README.md:37). At 100 TB
    * the overwrite would target a date partition
    * (.partitionBy("load_date")) rather than the whole table; the mode
    * semantics are identical. */
  def snapshotLoad(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** R1-R7 end to end. */
  def run(payloads: DataFrame, payloadCol: String, outPath: String): Unit =
    snapshotLoad(normalize(payloads, payloadCol), outPath)

  /** Incremental merge — the 100 TB successor to R7's full overwrite:
    * key-matched rows take the UPDATE's values, unmatched existing
    * rows survive, unmatched updates insert (classic MERGE/upsert,
    * composed as one full outer join + per-column coalesce since plain
    * parquet has no transactional MERGE).
    *
    * Rewriting 100 TB nightly to refresh 0.1% of rows is the snapshot
    * pattern's scale failure; the merge touches one join's worth of
    * work instead — shuffle both sides on the key (or neither, when
    * both are bucketed on it via Warehouse.writeBucketed), then write.
    * Precedence needs NO null-sentinel trickery: the join's match
    * STRUCTURE (an update-side key column being non-null) decides,
    * so genuinely-null update values overwrite too — pinned in
    * PipelineSpec.
    *
    * Requires both frames to share the schema (checked) and `key` to
    * be unique per side (a MERGE precondition; duplicate update keys
    * would fan out like any join). */
  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(existing.columns.toSeq == updates.columns.toSeq,
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    require(existing.columns.contains(key), s"key $key not in schema")
    val valueCols = existing.columns.filter(_ != key).toSeq
    val e = existing.select(col(key) +: valueCols.map(c => col(c).as(s"__e_$c")): _*)
    val u = updates.select(col(key).as("__u_key") +:
      valueCols.map(c => col(c).as(s"__u_$c")): _*)
    e.join(u, col(key) === col("__u_key"), "full")
      .select(
        coalesce(col(key), col("__u_key")).as(key) +:
          valueCols.map(c =>
            when(col("__u_key").isNotNull, col(s"__u_$c"))
              .otherwise(col(s"__e_$c")).as(c)): _*)
  }

  /** SCD TYPE-2 dimension build from a change log — the warehouse-side
    * complement of the as-of join (ops.AsOf answers "which version was
    * live at time t"; this MATERIALIZES the version intervals so any
    * engine can answer it with a plain range predicate):
    *
    *  1. CHANGE DETECTION: a log row opens a new version only when
    *     `attrCol` differs from the key's previous row (lag over the
    *     (orderCol, tieCol) order) — repeated writes of the same value
    *     are no-ops and collapse away, so interval count tracks real
    *     transitions, not log volume.
    *  2. INTERVAL ASSIGNMENT: effective_from = the change row's
    *     orderCol; effective_to = the NEXT change's orderCol (null on
    *     the open/current version); is_current flags it.
    *
    * Scale shape: ONE shuffle on the key feeds both windows (same
    * partitioning, same ordering — Spark evaluates them in one Window
    * operator chain without re-sorting), and the change filter runs
    * between them, so the interval window sorts only surviving change
    * rows. `tieCol` must make (orderCol, tieCol) unique per key or
    * version order is undefined — the standard CDC sequencing
    * requirement. */
  def scd2(changes: DataFrame, keyCol: String, orderCol: String,
           tieCol: String, attrCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val logOrder = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val detected = changes
      .withColumn("__rn", row_number().over(logOrder))
      .withColumn("__prev", lag(col(attrCol), 1).over(logOrder))
      // null-safe inequality so a null↔non-null transition IS a
      // change; the explicit first-row test keeps a key whose FIRST
      // attribute is null (lag's null is indistinguishable from a real
      // null prev, and <=> would wrongly collapse that opening row)
      .filter(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
      .drop("__rn", "__prev")
    detected
      .withColumn("effective_from", col(orderCol))
      .withColumn("effective_to", lead(col(orderCol), 1).over(logOrder))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Snapshot reconciliation diff — classify every key across two
    * snapshot versions as added / removed / changed / unchanged (the
    * audit a pipeline runs between yesterday's and today's load, and
    * the primitive behind data-reconciliation reports). Change
    * detection is null-safe (<=>) over EVERY non-key column, so a
    * null↔value flip counts as a change and null↔null does not.
    *
    * Scale shape: ONE full-outer join keyed on `key` — both snapshots
    * shuffle once on the same key (bucketed snapshots make it
    * Exchange-free, the q96 discipline); the wide columns travel only
    * to their own join and collapse to a one-string status on the way
    * out. Requires `key` unique per snapshot (same precondition as
    * upsert). */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    require(oldDf.columns.contains(key), s"key $key not in schema")
    val valueCols = oldDf.columns.filter(_ != key).toSeq
    val o = oldDf.select(col(key).as("__o_key") +:
      valueCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(col(key).as("__n_key") +:
      valueCols.map(c => col(c).as(s"__n_$c")): _*)
    val same = valueCols.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, col("__o_key") === col("__n_key"), "full")
      .select(
        coalesce(col("__o_key"), col("__n_key")).as(key),
        when(col("__o_key").isNull, "added")
          .when(col("__n_key").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("diff_status"))
  }

  /** Per-key ALGEBRAIC aggregate state (count / decimal sum / min /
    * max) — the mergeable-partials counterpart of the HLL sketch table
    * (ops.Sketch): these four are exactly the aggregates whose partials
    * roll up losslessly, so a stored state table plus a fresh batch's
    * partials re-aggregate to the full-history answer WITHOUT
    * rescanning history. The sum accumulates as decimal — exact and
    * order-invariant — so state ∘ merge is bit-equal to a single pass
    * at any batch split (the property q151 puts under the hash gate,
    * THROUGH a parquet write/read round trip). */
  def aggState(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Merge aggregate states: count and sum add, min/max fold — one
    * key shuffle over state-sized (not history-sized) inputs. */
  def mergeAggState(state: DataFrame, batch: DataFrame, key: String): DataFrame =
    state.unionByName(batch)
      .groupBy(col(key))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum")).as("sum"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** INCREMENTAL JOIN-VIEW MAINTENANCE (insert-only IVM; the q151
    * aggregate-maintenance discipline applied to a two-table equi
    * join): with both sides arriving in batches, the new matches a
    * batch (ΔL, ΔR) contributes to M = L ⋈ R are exactly
    *
    *   ΔM = ΔL ⋈ R_acc  ∪  L_acc ⋈ ΔR  ∪  ΔL ⋈ ΔR
    *
    * (accumulated sides BEFORE this batch — every cross-batch pair is
    * produced once: the pair (l, r) with l in batch i, r in batch j
    * appears in exactly the max(i,j) step). Appending ΔM to the view
    * and the deltas to their accumulators maintains M without ever
    * recomputing old matches — the deployment shape where both fact
    * feeds land continuously and the joined view is served
    * downstream.
    *
    * Scale shape per batch: the deltas shuffle at BATCH size; the
    * accumulated sides at 100 TB are bucketed on the key
    * (Warehouse.writeBucketed) so their side of each join is
    * Exchange-free — the q122 incremental-index shape. Insert-only by
    * design; updates/deletes need keyed retraction rows (the
    * upsert/tableDiff machinery) before the join algebra applies.
    *
    * Returns ΔM for this batch; the caller appends it to the view. */
  def joinViewDelta(lAcc: DataFrame, rAcc: DataFrame,
                    dL: DataFrame, dR: DataFrame,
                    key: String): DataFrame = {
    // a shared non-key name would make every delta join emit ambiguous
    // duplicate columns that only fail later, at the view write
    val shared = (dL.columns.toSet & dR.columns.toSet) - key
    require(shared.isEmpty,
      s"non-key columns must be disjoint across the join sides: ${shared.mkString(", ")}")
    val newOld = dL.join(rAcc, Seq(key))
    val oldNew = lAcc.join(dR, Seq(key))
    val newNew = dL.join(dR, Seq(key))
    newOld.unionByName(oldNew).unionByName(newNew)
  }
}
