package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §4 "salted keys on skew
  * joins"). AQE's skew-join splitting handles moderate skew
  * automatically; these are the explicit tools for the pathological
  * cases a 100 TB corpus WILL contain (a null-heavy foreign key, a
  * boilerplate document hashed a billion times, one viral user_id).
  *
  * Both transforms are pure DataFrame rewrites — deterministic salt
  * derived from existing columns (never rand(): a retried task must
  * re-salt identically or shuffle-replay corrupts results).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the tie-break column
    * (e.g. a row id) — spreads one hot key across `buckets` reducers. */
  def salt(tieBreak: Column, buckets: Int): Column =
    pmod(xxhash64(tieBreak), lit(buckets.toLong)).cast("int")

  /** Two-phase aggregation for skewed group keys:
    * groupBy(key, salt) partial-aggregates the hot key on `buckets`
    * reducers, then groupBy(key) merges the per-salt partials. Supports
    * the decomposable aggregates (sum/count/min/max) — the merge of a
    * partial count is a SUM, which `merge` must express.
    *
    * At 100 TB: Spark's own partial aggregation already does this
    * map-side; the explicit salted form matters when the DISTINCT count
    * of (key) is tiny (a handful of reducers own everything) or the
    * aggregate buffer is wide. */
  def saltedAgg(df: DataFrame, key: Column, tieBreak: Column, buckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.groupBy(key.as("__key"), salt(tieBreak, buckets).as("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Skew-safe equi join of a skewed FACT side against a small-but-
    * not-broadcastable DIM side: the fact side gets a deterministic
    * salt, the dim side is EXPLODED `buckets`× so every (key, salt)
    * combination finds its partner. Row multiplication is dim-side
    * only — buckets × |dim| extra rows buys the hot fact key a
    * `buckets`-way spread.
    *
    * Prefer, in order: broadcast (if dim fits), AQE skew split
    * (moderate skew), THIS (pathological skew + medium dim). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factTieBreak: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(factTieBreak, buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
