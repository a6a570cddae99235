package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — two tables of half-open intervals
  * [start, end) matched where they intersect (ad attribution windows,
  * session × campaign, genomic ranges). The naive join condition
  * `ls < re AND rs < le` has no equi component, so Spark plans a
  * BroadcastNestedLoopJoin — quadratic once neither side fits a
  * broadcast, the classic interval-join scale trap.
  *
  * The scale-correct shape is BIN-AND-RESIDUAL: replicate each
  * interval into every fixed-width bin it touches (explode — row-local
  * fan-out of ceil(len/width)+1 rows), equi-join on (keys…, bin), then
  * apply the exact overlap predicate as a residual filter and collapse
  * the multi-bin duplicates (a pair overlapping across k shared bins
  * matches k times) by the id pair. The join is a plain hash/SMJ join
  * on fixed-size keys; PlanShapeSpec pins that no nested-loop join
  * survives anywhere in q130's plan.
  *
  * Bin width tunes the replication-vs-selectivity trade: width ≈ the
  * TYPICAL interval length gives ~2 bins per row; much smaller widths
  * blow up the fan-out, much larger ones degrade the bin key's
  * selectivity toward per-key cross products. Degenerate-skew caveat:
  * all intervals overlapping one hot (key, bin) cell still meet in one
  * task — AQE skew-join splits moderate cases (VERIFIED: SkewSpec
  * plants a hot key and pins (skew=true) in the final adaptive plan),
  * and a production deployment caps pathological cells upstream (same
  * discipline as the LSH bucket-size cap).
  *
  * Bounds are LONGS (e.g. epoch micros; bin math is exact long
  * arithmetic — double division of large epochs rounds — with a
  * true-floor correction so negative-coordinate domains bin at
  * uniform width). Intervals must be non-empty (start < end):
  * degenerate rows (start >= end — empty or inverted) are DROPPED
  * before binning, because half-open semantics say they overlap
  * nothing, while mechanically they would still emit rows — sequence()
  * on an inverted bin range generates a DESCENDING sequence, and a
  * zero-length [s, s) passes the residual against any interval
  * straddling s. */
object IntervalJoin {

  /** INTERVAL COALESCING (union of half-open intervals per key — the
    * gaps-and-islands merge): overlapping OR touching [s, e) intervals
    * collapse into one maximal interval; a gap (next start strictly
    * greater than the running max end) opens a new island. Touching
    * merges because [a, b) ∪ [b, c) = [a, c) under half-open
    * semantics. The availability/uptime/exposure primitive — and the
    * normalization pass that bounds overlapJoin's per-cell fan-out.
    *
    * Shape: ONE shuffle on the key columns feeds both windows (running
    * max of prior ends → island flag → running island id) and the
    * island aggregate — q114's sessionization machinery generalized
    * to intervals that OUTLAST their successors' starts (a plain
    * lag(end) would split an island whose first interval covers the
    * rest; the running max does not). Bounds are longs (epoch micros);
    * island boundaries are exact integer compares, so the whole pass
    * is engine-replayable (q187). Degenerate rows (start >= end) are
    * dropped, same contract as overlapJoin. Output: one row per
    * merged interval — (keys…, start, end, n_merged). */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String],
                        s: String, e: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(s), col(e))
    val prevMax = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(s), col(e))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = df.filter(col(s) < col(e))
      .withColumn("__pmax", max(col(e)).over(prevMax))
      .withColumn("__new",
        when(col("__pmax").isNull || col(s) > col("__pmax"), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy((keyCols.map(col) :+ col("__island")): _*)
      .agg(min(col(s)).as("start"), max(col(e)).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  def overlapJoin(left: DataFrame, leftId: String, ls: String, le: String,
                  right: DataFrame, rightId: String, rs: String, re: String,
                  keyCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // true FLOOR division in exact long arithmetic: SQL `div` truncates
    // toward zero, which would make bin 0 span (-w, +w) — double width,
    // concentrating every near-origin interval of a signed domain into
    // one hot cell. Backticked names so dotted/spaced columns parse.
    def floorDiv(name: String) = {
      val d = expr(s"`$name` div $binWidth")
      when(col(name) < 0 && col(name) % binWidth =!= 0, d - 1).otherwise(d)
    }
    def binned(df: DataFrame, s: String, e: String) =
      df.filter(col(s) < col(e))
        .withColumn("__e1", col(e) - 1)
        .withColumn("__bin", explode(sequence(floorDiv(s), floorDiv("__e1"))))
        .drop("__e1")
    val lb = binned(left, ls, le)
    val rb = binned(right, rs, re)
    lb.join(rb, keyCols :+ "__bin")
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .dropDuplicates(leftId, rightId)
      .drop("__bin")
  }
}
