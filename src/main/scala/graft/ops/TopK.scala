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
}
