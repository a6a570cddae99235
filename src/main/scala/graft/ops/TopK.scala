package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Grouped top-k: the k best rows per group (global top-k is
  * TakeOrderedAndProject; Spark has no grouped analog).
  *
  * Two implementations with identical results:
  *
  *  - `viaWindow`: row_number over (group, order) then filter — the
  *    idiomatic form, but it shuffles EVERY row to sort each group.
  *  - `viaAgg`: a bounded-heap Aggregator. Spark's two-phase
  *    aggregation turns the buffer into per-partition partial heaps:
  *    the shuffle carries at most k (score, id) pairs per group per
  *    partition instead of all rows — the distributed top-k algorithm,
  *    expressed through the aggregation machinery rather than a custom
  *    SparkPlan (SURVEY.md §4.2 candidate #1; preference (a)/(b) of
  *    the extension ladder — no custom Strategy needed).
  *
  * The Aggregator lives outside the oracle query set (UDAF ⇒ no
  * whole-stage codegen for the agg itself), but the shuffle-volume win
  * dominates at 100 TB when k ≪ rows-per-group. */
object TopK {

  /** Baseline: window rank + filter. Shuffles all rows. */
  def viaWindow(df: DataFrame, groupCol: String, orderCol: String,
                idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(desc(orderCol), col(idCol))
    df.select(col(groupCol), col(orderCol), col(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Bounded top-k buffer: descending by score, ties broken by
    * ascending id (matching viaWindow's order). */
  class TopKAgg(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def bound(xs: Array[(Double, Long)]): Array[(Double, Long)] =
      xs.sortWith(better).take(k)
    override def zero: Array[(Double, Long)] = Array.empty
    override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] =
      if (buf.length >= k && better(buf.last, x)) buf else bound(buf :+ x)
    override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
      bound(a ++ b)
    override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf
    override def bufferEncoder: Encoder[Array[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
    override def outputEncoder: Encoder[Array[(Double, Long)]] = bufferEncoder
  }

  def topKAgg(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)

  /** Aggregator form: one partial+final aggregation, shuffle bounded
    * by k·groups·partitions rows. Output schema matches viaWindow. */
  def viaAgg(df: DataFrame, groupCol: String, orderCol: String,
             idCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(topKAgg(k, col(orderCol).cast("double"), col(idCol).cast("long")).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol),
        col("t._1").as(orderCol), col("t._2").as(idCol))

  /** 2-D SKYLINE (Pareto frontier): rows where no other row is at
    * least as good on both axes and strictly better on one —
    * minimize `minCol`, maximize `maxCol` (dominance: b ≺ a iff
    * b.min <= a.min AND b.max >= a.max AND one strict). Exact ties on
    * both axes survive together (neither dominates).
    *
    * The naive formulation is the quadratic NOT EXISTS self-join (the
    * DuckDB oracle). This runs on the DOMAIN instead: a row is on the
    * frontier iff (1) its `maxCol` equals its `minCol`-group's max —
    * any same-min higher-max row strictly dominates — and (2) that
    * group max strictly exceeds the running max over all STRICTLY
    * smaller `minCol` groups — a smaller-min, >=-max row dominates
    * via the strict min. So: one map-side-combined groupBy(minCol)
    * for per-group maxes, a running max over the GROUP table (domain-
    * sized — the global window runs on |distinct minCol| rows, never
    * the corpus; same discipline as runningTotalByRange's offsets
    * table), and one broadcast join back. The corpus is scanned once
    * and never sorted globally.
    *
    * Null on either axis drops the row: dominance comparisons are
    * three-valued and a null row can neither dominate nor defensibly
    * survive.
    *
    * `minCol` must be a bounded-domain axis (a size, a grade, a
    * bucketed measure): the group table and the broadcast are
    * |distinct minCol|-sized. A continuous axis needs bucketing
    * first (equiDepthHistogram gives the cuts). */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val rows = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val groupMax = rows.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__gmax"))
    val frontier = groupMax
      .withColumn("__m", max(col("__gmax")).over(
        Window.orderBy(col(minCol))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("__m").isNull || col("__gmax") > col("__m"))
      .select(col(minCol).as("__fmin"), col("__gmax"))
    rows.join(broadcast(frontier),
        col(minCol) === col("__fmin") && col(maxCol) === col("__gmax"))
      .drop("__fmin", "__gmax")
  }
}
