package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-reduction operators: shrink the expensive side of a big join
  * BEFORE its shuffle, using information from the other side — the
  * classic semi-join reduction / LIP ("lookahead information passing",
  * Zhu et al., SIGMOD 2017) pattern every warehouse engine applies to
  * selective star joins.
  *
  * Why it matters at 100 TB: a fact⋈dim join where the dim carries a
  * selective predicate still shuffles the ENTIRE fact table before the
  * join discards 95% of it. Passing the surviving dim keys to the fact
  * side first — as a broadcast semi join (exact) — moves that discard
  * BELOW the fact shuffle: only matching fact rows are hashed,
  * serialized, and sent over the network.
  *
  * Relationship to Spark's built-ins:
  *  - DPP (dynamic partition pruning) does this for PARTITION columns
  *    only; the fact key of a fact⋈dim join is rarely the partition key.
  *  - Spark's runtime bloom filter (`spark.sql.optimizer.runtime.
  *    bloomFilter.enabled`, default on since 3.4) injects an
  *    approximate version automatically, but only when size thresholds
  *    (`creationSideThreshold`, 10 MB default; application-side scan
  *    ≥ 10 GB) and cost heuristics line up — and never through seams
  *    the optimizer can't see through (custom sources, checkpoints).
  *    That injection is pinned as a tested fact in PlanShapeSpec
  *    ("runtime bloom filter injects..."): with the thresholds in
  *    range, a selective dim predicate plants a `bloom_filter_agg` →
  *    `might_contain` pre-filter below the fact shuffle. `semiReduce`
  *    is the explicit, exact form for when the rewrite must be
  *    guaranteed.
  *
  * Exactness: a semi join keeps precisely the fact rows with a join
  * partner, so `semiReduce(fact, dim, k).join(dim, k)` ≡
  * `fact.join(dim, k)` on any input — which makes the plain join the
  * DuckDB oracle for q84. (A bloom pre-filter would only be ⊇, with
  * false positives removed by the join itself; equally correct but not
  * plan-guaranteed here.)
  */
object JoinOpt {

  /** Pre-filter `fact` to the rows whose `factKey` appears in
    * `dim.dimKey`, via a BROADCAST left-semi join on the distinct dim
    * keys. The broadcast side is one deduplicated key column — orders
    * of magnitude smaller than the dim payload, so it stays
    * broadcastable long after the dim itself outgrows the threshold.
    *
    * The later real join re-checks the key, so even if the semi side
    * were stale/approximate the result would stay exact; with the
    * exact key set the reduction is lossless by construction. */
  def semiReduce(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String): DataFrame =
    fact.join(
      broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_semi")
}
