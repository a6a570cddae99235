package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.RewriteAggOnRollup — the materialized-view matching rule.
  * Pins: the canonical report's physical plan reads the ROLLUP (not
  * the fact scan), results are identical with the rule disarmed, and
  * every soundness gate declines (misaligned bounds, foreign
  * aggregates, extra grouping keys, unset conf). */
class MvRewriteSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def arm(): Unit = {
    // the gated query's own setup builds the rollup + sets the confs
    SparkEntry.queries("q336_rollup_rewrite")(spark, dir)
    ()
  }

  private def disarm(): Unit = {
    spark.conf.unset("spark.graft.rollup.daily.path")
    spark.conf.unset("spark.graft.rollup.daily.source")
  }

  private def canonical(lo: String, hi: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(lo).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev_d"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  private def scansRollup(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("graft-rollup-") && !p.contains("lineitem.parquet")
  }

  private def scansFact(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("lineitem.parquet") && !p.contains("graft-rollup-")
  }

  test("the canonical report is rewritten onto the rollup scan, bit-identical results") {
    arm()
    try {
      val rewritten = canonical("1995-01-01 00:00:00", "1996-01-01 00:00:00")
      assert(scansRollup(rewritten),
        rewritten.queryExecution.executedPlan.toString)
      val got = rewritten.collect()
      disarm()
      val raw = canonical("1995-01-01 00:00:00", "1996-01-01 00:00:00")
      assert(scansFact(raw))
      assert(got.toSeq === raw.collect().toSeq)
      assert(got.nonEmpty)
    } finally disarm()
  }

  test("the unfiltered whole-table report also rewrites; results identical") {
    arm()
    try {
      val rewritten = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("rev_d"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
      assert(scansRollup(rewritten))
      val got = rewritten.collect()
      disarm()
      val raw = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("rev_d"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
      assert(got.toSeq === raw.collect().toSeq)
    } finally disarm()
  }

  test("soundness gates decline to the fact scan") {
    arm()
    try {
      // intra-day bound: the day-grain rollup cannot answer it
      assert(scansFact(
        canonical("1995-01-01 00:00:00", "1995-06-15 12:00:00")))
      // a foreign aggregate (avg) in the list
      assert(scansFact(
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(avg(col("l_quantity")).as("q"))))
      // an extra grouping key the rollup doesn't carry
      assert(scansFact(
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,4)")).as("rev_d"),
            count(lit(1)).as("n_lines"))))
      // a different revenue expression (tax, not discount)
      assert(scansFact(
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_tax")))
              .cast("decimal(18,4)")).as("rev_d"),
            count(lit(1)).as("n_lines"))))
      // a suffix-only source conf must DECLINE, not match any lineitem
      // scan (r15, ADVICE: path equality, not endsWith)
      spark.conf.set("spark.graft.rollup.daily.source", "lineitem.parquet")
      assert(scansFact(
        canonical("1995-01-01 00:00:00", "1996-01-01 00:00:00")))
      // unset conf: the rule must be inert
      disarm()
      assert(scansFact(
        canonical("1995-01-01 00:00:00", "1996-01-01 00:00:00")))
    } finally disarm()
  }

  test("subset-grouping (daily) report rewrites onto the rollup; month-grain and intra-day decline") {
    // r15: grouping keys {day} ⊂ rollup keys (day, flag) — the rule
    // re-aggregates over the flag; the answer must be bit-identical
    // to the raw fact scan.
    arm()
    try {
      def daily(lo: String, hi: String,
                dayExpr: org.apache.spark.sql.Column): DataFrame =
        Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit(lo).cast("timestamp_ntz") &&
            col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
          .groupBy(dayExpr.as("day"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,4)")).as("rev_d"),
            count(lit(1)).as("n_lines"))
          .orderBy("day")
      val dayOf = col("l_shipdate").cast("date").cast("timestamp_ntz")
      val rewritten = daily("1995-03-01 00:00:00", "1995-06-01 00:00:00", dayOf)
      assert(scansRollup(rewritten),
        rewritten.queryExecution.executedPlan.toString)
      val got = rewritten.collect()
      // month-grain grouping cannot be re-derived day-exactly by this
      // matcher — declines to the fact scan
      assert(scansFact(daily("1995-03-01 00:00:00", "1995-06-01 00:00:00",
        date_trunc("month", col("l_shipdate")))))
      // intra-day bound declines at this shape too
      assert(scansFact(daily("1995-03-01 00:00:00", "1995-06-01 12:00:00",
        dayOf)))
      disarm()
      val raw = daily("1995-03-01 00:00:00", "1995-06-01 00:00:00", dayOf)
      assert(scansFact(raw))
      assert(got.toSeq === raw.collect().toSeq)
      assert(got.length > 1)
    } finally disarm()
  }

  test("a legacy DECIMAL(18,4) rollup declines (rev dtype gate)") {
    // a downcast rollup can hold NULLs from silent overflow — the
    // rewrite must refuse to read one (r15, ADVICE)
    arm()
    try {
      val path = spark.conf.get("spark.graft.rollup.daily.path")
      val legacy = TempDirs.scratch("graft-rollup-legacy-")
      spark.read.parquet(path)
        .withColumn("rev", col("rev").cast("decimal(18,4)"))
        .write.mode("overwrite").parquet(legacy)
      spark.conf.set("spark.graft.rollup.daily.path", legacy)
      assert(scansFact(
        canonical("1995-01-01 00:00:00", "1996-01-01 00:00:00")))
    } finally disarm()
  }
}
