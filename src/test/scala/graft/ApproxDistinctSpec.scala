package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q25 is excluded from the DuckDB oracle by contract (approx sketches
  * don't hash-match); this spec is its correctness story instead:
  * HLL++ estimates must land within a small multiple of the configured
  * relative standard deviation of the exact count. */
class ApproxDistinctSpec extends AnyFunSuite with SparkFixture {

  test("approx_count_distinct within 4×rsd of exact on fixture columns") {
    val rsd = 0.05
    val li = Tables.lineitem(spark, sfDir)
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) {
      val row = li.agg(
        countDistinct(col(c)).as("exact"),
        approx_count_distinct(col(c), rsd).as("approx")).collect()(0)
      val exact = row.getLong(0).toDouble
      val approx = row.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 4 * rsd,
        s"$c: exact=$exact approx=$approx")
    }
  }

  test("q25 grouped estimates within 4×rsd of exact per group") {
    val li = Tables.lineitem(spark, sfDir)
    val rows = li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.2,
        s"${r.get(0)}: exact=$exact approx=$approx")
    }
  }

  test("q36 approx_percentile within accuracy-bound rank error of exact per group") {
    // accuracy = 1000 ⇒ guaranteed rank error ≤ n/1000 per group; the
    // VALUE gap that rank slack allows is data-dependent, so assert on
    // the rank of the approximate value, not the value itself.
    val li = Tables.lineitem(spark, sfDir)
    val rows = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("approx"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val flag = r.getString(0)
      val approx = r.getSeq[Double](1)
      val n = r.getLong(2).toDouble
      for ((q, a) <- Seq(0.5, 0.9).zip(approx)) {
        val rank = li.filter(col("l_returnflag") === flag)
          .filter(col("l_extendedprice") <= a).count().toDouble / n
        assert(math.abs(rank - q) <= 2.0 / 1000 + 1.0 / n,
          s"$flag q=$q: approx value $a sits at rank $rank")
      }
    }
  }
}
