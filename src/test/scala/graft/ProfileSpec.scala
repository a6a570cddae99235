package graft

import graft.ops.Profile
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("profile counts rows/nulls/distincts and renders min/max per column") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")), (3L, Option("b")))
      .toDF("id", "s")
    val rows = Profile.profile(df, Seq("id", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(rows === Array(
      ("id", 4L, 0L, 3L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile is one scan + one aggregation, not a scan per column") {
    val plan = Profile.profile(Tables.orders(spark, sfDir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"expected exactly one file scan:\n$plan")
  }
}
