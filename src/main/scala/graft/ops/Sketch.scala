package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation (the rollup-table pattern): at
  * 100 TB, "distinct users per X over an arbitrary date range" cannot
  * rescan raw events per query — instead each ingest window persists a
  * fixed-size HLL sketch per (group, window), and queries UNION the
  * sketches for whatever range they need. Distinct counting is the one
  * aggregate that does NOT roll up from plain partial counts (distinct
  * is not additive); sketches restore additivity at a bounded, chosen
  * error.
  *
  * Built on Spark's own Apache DataSketches HLL expressions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  * functions added in Spark 3.5) — codegen-planned aggregates with
  * map-side partial combine: the shuffle carries one 2^lgK-register
  * sketch per group per partition, never raw values.
  *
  * Two laws make the pattern trustworthy (SketchSpec pins both):
  *  - LOSSLESS MERGE: estimate(union of window sketches) EQUALS
  *    estimate(one sketch over the concatenated data) exactly — HLL
  *    union is register-wise max, so splitting by window costs zero
  *    accuracy (same lgK).
  *  - BOUNDED ERROR: the estimate tracks exact distinct within the
  *    HLL relative-error envelope (~1.04/√2^lgK; lgK 12 ⇒ ~1.6%).
  */
object Sketch {

  /** One HLL sketch per group — the persisted rollup-table row. Write
    * this per ingest window (e.g. per day) with the window columns in
    * `groupCols`. */
  def buildSketches(df: DataFrame, valueCol: String, lgK: Int,
                    groupCols: Column*): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
  }

  /** Merge sketch rows up to a coarser grouping (drop the window
    * columns, keep the dimension ones): register-wise max union —
    * associative, commutative, re-runnable. */
  def rollupSketches(sketches: DataFrame, groupCols: Column*): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    sketches.groupBy(groupCols: _*)
      .agg(hll_union_agg(col("hll")).as("hll"))
  }

  /** Cardinality estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Rolling union over a sliding index window — "distinct users in
    * the trailing N windows" (rolling 7-day actives, 30-day MAU)
    * computed entirely over the tiny sketch table: the window frame
    * unions N fixed-size sketches per row, never revisits raw events,
    * and the lossless-merge law means the result is EXACTLY the
    * sketch that a direct pass over the N windows' raw data would
    * build. `orderIdx` must be a numeric window index (epoch days for
    * daily sketches) so the RANGE frame covers gaps: a missing day
    * contributes nothing rather than silently widening the window the
    * way a ROWS frame would. */
  def rollingUnion(sketch: Column, partition: Seq[Column],
                   orderIdx: Column, windows: Int): Column = {
    require(windows >= 1, s"window count must be >= 1, got $windows")
    import org.apache.spark.sql.expressions.Window
    hll_union_agg(sketch).over(
      Window.partitionBy(partition: _*).orderBy(orderIdx)
        .rangeBetween(-(windows - 1).toLong, 0L))
  }

  /** COUNT-MIN SKETCH bucket: row r's hash of a key, content-addressed
    * through md5 (q76/q124 discipline) — 6 hex chars (24 bits) parse
    * exactly into a long, mod width. Deterministic, partition-
    * invariant, and replayable by any engine with md5 + hex parsing —
    * which is what lets the WHOLE sketch lifecycle run under the
    * DuckDB hash gate (q184), unlike opaque-layout sketches (q127's
    * DataSketches registers) that need rows-only checks. */
  def cmBucket(key: Column, row: Column, width: Int, seed: Long): Column =
    conv(substring(md5(concat_ws(":",
      row.cast("string"), lit(seed.toString), key.cast("string"))), 1, 6),
      16, 10).cast("long") % width

  /** COUNT-MIN SKETCH build (Cormode & Muthukrishnan 2005): depth×width
    * integer counters; every occurrence of a key increments one counter
    * per row r at cmBucket(key, r). Output (r, bucket, cnt) — at most
    * depth·width rows REGARDLESS of corpus size, the whole point: the
    * shuffle carries map-side-combined counter partials, never keys,
    * and the result is a fixed-size frequency summary with one-sided
    * error (estimates never undercount; overcounts bounded by
    * 2n/width per row w.p. 1/2 each, so min over depth rows
    * concentrates — SketchSpec pins the never-undercount law).
    *
    * Mergeable: counters from disjoint batches ADD (countMinMerge), so
    * per-window sketch tables roll up like q127/q134's HLL rows. */
  def countMinBuild(df: DataFrame, keyCol: String, depth: Int, width: Int,
                    seed: Long): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    df.select(col(keyCol).cast("string").as("__k"))
      .withColumn("r", explode(array((0 until depth).map(i => lit(i)): _*)))
      .groupBy(col("r"), cmBucket(col("__k"), col("r"), width, seed).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum counter tables from disjoint batches — the additive
    * counterpart of HLL's register-max union. */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `keys` (one column `keyCol`,
    * distinct): est(k) = min over rows r of counter[r][cmBucket(k,r)].
    * The counter table is depth·width rows — broadcast — so the probe
    * is one narrow join however many keys are queried. Keys absent
    * from the build read counters that other keys may have bumped:
    * still >= 0 = their true count (the one-sided error law). */
  def countMinEstimate(counters: DataFrame, keys: DataFrame, keyCol: String,
                       depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    keys.select(col(keyCol))
      .withColumn("r", explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("bucket", cmBucket(col(keyCol), col("r"), width, seed))
      .join(broadcast(counters), Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** EQUI-JOIN SIZE ESTIMATE from two count-min counter tables over
    * the SAME (depth, width, seed): |A ⋈_k B| = Σ_k f_A(k)·f_B(k) is
    * estimated by min over rows r of Σ_b cA[r][b]·cB[r][b] — the
    * CM inner-product estimator (Cormode & Muthukrishnan 2005 §4.2),
    * one-sided like the point estimates (never BELOW the true join
    * size; collisions only add). The optimizer-statistics primitive:
    * two fixed-size sketches built in each table's ingest pass answer
    * "how big would this join be" without touching either table
    * again. The arithmetic is depth·width-sized — driver-free,
    * engine-replayable (q198 runs the whole lifecycle under the hash
    * gate). */
  def countMinInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("r"), col("bucket"), col("cnt").as("__cb")),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min(col("__ip")).as("cm_join_est"))

  /** Overlap estimate between two sketches by inclusion-exclusion:
    * |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B). The union rides the
    * lossless-merge law, so the only error is the three estimates' —
    * which CANCELS poorly when the true overlap is small relative to
    * the sets (the relative error applies to the big terms, the
    * result is their difference; can go slightly negative, clamped at
    * 0). Use for audience-overlap / cross-corpus-contamination
    * triage, not as an exact gate — the exact gates are the anti-join
    * (q110) and decontamination (q100/q108) paths. SketchSpec bounds
    * the behavior on planted overlaps. */
  def estimateIntersection(a: Column, b: Column): Column =
    greatest(lit(0.0),
      hll_sketch_estimate(a) + hll_sketch_estimate(b) -
        hll_sketch_estimate(hll_union(a, b)))

  // ---- KLL quantile sketches (expressions/KllExpressions.scala) ----
  // The THIRD non-additive aggregate family, completing the rollup-
  // table symmetry: distinct counts (HLL, above), heavy hitters
  // (approx_top_k, q143), and now percentiles — "p95 over an
  // arbitrary date range" from |days|×|groups| fixed-size sketch rows
  // instead of a corpus rescan. Same TypedImperativeAggregate shape
  // as Spark's own hll_sketch_agg (map-side partial combine; the
  // shuffle carries one ~O(k log(n/k)) sketch per group, never rows).

  /** One KLL quantile sketch per group — the persisted rollup-table
    * row (column `kll`, the library's portable serialized layout).
    * Nulls are skipped; the per-group item count stays EXACT inside
    * the sketch (graft_kll_n). */
  def buildKllSketches(df: DataFrame, valueCol: Column, k: Int,
                       groupCols: Column*): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(call_function("graft_kll_agg",
        valueCol.cast("double"), lit(k)).as("kll"))

  /** Union persisted sketch rows back to coarser groups — the range-
    * query read path (q134's rollupSketches analog). */
  def rollupKllSketches(sketches: DataFrame, groupCols: Column*): DataFrame =
    sketches.groupBy(groupCols: _*)
      .agg(call_function("graft_kll_merge", col("kll")).as("kll"))

  /** INCLUSIVE quantile at normalized rank ∈ [0, 1]; null for an
    * empty sketch. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    call_function("graft_kll_quantile", sketch, lit(rank))

  /** Exact absorbed-item count (getN — only ranks approximate). */
  def kllN(sketch: Column): Column = call_function("graft_kll_n", sketch)

  /** Trailing-N-window KLL merge as a RANGE-frame window aggregate
    * over the tiny per-(group, window) sketch table — the quantile
    * face of `rollingUnion` (q138): "trailing-7-day p95" unions 7
    * fixed-size sketches per output row instead of rescanning 7 days
    * of raw events per day. Keyed on an epoch index so calendar gaps
    * stay gaps (a ROWS frame would silently widen the window). */
  def kllRollingMerge(sketch: Column, partition: Seq[Column],
                      orderIdx: Column, windows: Int): Column = {
    require(windows >= 1, s"window count must be >= 1, got $windows")
    import org.apache.spark.sql.expressions.Window
    call_function("graft_kll_merge", sketch).over(
      Window.partitionBy(partition: _*).orderBy(orderIdx)
        .rangeBetween(-(windows - 1).toLong, 0L))
  }
}
