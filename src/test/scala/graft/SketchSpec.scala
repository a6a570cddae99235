package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two laws that make persisted sketch rollups trustworthy at
  * scale (q127): lossless windowed merge and bounded estimate error. */
class SketchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def events = Tables.events(spark, sfDir)
    .withColumn("day", to_date(col("ts")))

  test("windowed sketches union losslessly: rollup estimate equals single-pass") {
    val daily = Sketch.buildSketches(events, "user_id", lgK = 12,
      col("event_type"), col("day"))
    val rolled = Sketch.rollupSketches(daily, col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    val singlePass = Sketch.buildSketches(events, "user_id", lgK = 12,
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    // HLL union is register-wise max: splitting by window costs ZERO
    // accuracy — exact equality, not approximate
    assert(rolled === singlePass)
    assert(rolled.nonEmpty)
  }

  test("rollup estimate tracks exact distinct within the lgK error envelope") {
    val est = Sketch.rollupSketches(
        Sketch.buildSketches(events, "user_id", lgK = 12,
          col("event_type"), col("day")),
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    // lgK 12 ⇒ ~1.04/sqrt(4096) ≈ 1.6% relative standard error; 5%
    // is a >3-sigma bound on the fixture cardinalities
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k) - n).toDouble / n
      assert(rel < 0.05, s"$k: est ${est(k)} vs exact $n (rel $rel)")
    }
  }
}
