package graft

import graft.pipeline.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout plans: bucketing must delete the join shuffle,
  * partitioning must delete the non-matching scan. These are the two
  * write-time layout decisions the 100 TB design leans on. */
class WarehouseSpec extends AnyFunSuite with SparkFixture {

  test("bucketed tables join with no Exchange and no Sort (co-located SMJ)") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    Warehouse.writeBucketed(li, "graft_li_b", "l_orderkey", 4)
    Warehouse.writeBucketed(o, "graft_o_b", "l_orderkey", 4)
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.sources.bucketing.enabled" -> "true") {
        val joined = spark.table("graft_li_b")
          .join(spark.table("graft_o_b"), Seq("l_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        // same join on the UNBUCKETED parquet shuffles both sides
        val unbucketed = li.join(o, Seq("l_orderkey"))
          .queryExecution.executedPlan.toString
        assert(unbucketed.contains("Exchange"))
        // and the result is identical either way
        assert(joined.count() === li.join(o, Seq("l_orderkey")).count())
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part-").toString
    val events = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    Warehouse.writePartitioned(events, dir, "event_date")

    val dates = spark.read.parquet(dir)
      .select("event_date").distinct().collect().map(_.get(0).toString).sorted
    assert(dates.length > 1, "fixture must span multiple dates for this test")

    val q = spark.read.parquet(dir).filter(col("event_date") === dates.head)
    val scan = q.queryExecution.executedPlan.toString
    // the date predicate must reach the scan as a PARTITION filter
    // (directory-level listing skip), not a mere data filter.
    // (DataFrame.inputFiles can't show this — it lists the whole
    // relation before pruning.)
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(scan).isDefined,
      s"date predicate did not become a partition filter:\n$scan")
    // correctness: pruned read equals the expected per-date row count
    val expected = events.filter(col("event_date") === dates.head).count()
    assert(q.count() === expected && q.count() > 0)
  }
}
