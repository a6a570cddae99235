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
  )

  val oracles: Map[String, String] = Map(
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
  )
}
