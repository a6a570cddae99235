package graft

import graft.ops.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grouped top-k: the bounded-heap Aggregator form must return exactly
  * what the window form returns — on fixtures and on tie-heavy edge
  * data — while shuffling only k rows per group per partition. */
class TopKSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(String, Double, Long)] =
    df.select(col("g").cast("string"), col("score").cast("double"), col("id").cast("long"))
      .as[(String, Double, Long)].collect().toSet

  test("viaAgg equals viaWindow on the lineitem fixture (top-5 revenue per flag)") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * col("l_quantity")).as("score"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
    val w = TopK.viaWindow(li, "g", "score", "id", 5)
    val a = TopK.viaAgg(li, "g", "score", "id", 5)
    assert(canon(w) === canon(a))
    assert(a.count() === 3 * 5) // 3 flags × k
  }

  test("viaAgg handles ties, k larger than group, and empty input like viaWindow") {
    val df = Seq(
      ("x", 5.0, 1L), ("x", 5.0, 2L), ("x", 5.0, 3L), // all tied
      ("y", 1.0, 4L))                                 // group smaller than k
      .toDF("g", "score", "id")
    val w = TopK.viaWindow(df, "g", "score", "id", 2)
    val a = TopK.viaAgg(df, "g", "score", "id", 2)
    assert(canon(w) === canon(a))
    assert(canon(a) === Set(("x", 5.0, 1L), ("x", 5.0, 2L), ("y", 1.0, 4L)))
    assert(TopK.viaAgg(df.filter(lit(false)), "g", "score", "id", 2).isEmpty)
  }

  test("skyline2d: dominance, both-axis ties survive, nulls drop, brute-force equal") {
    val df = Seq(
      (1L, 1, 10.0),  // frontier (smallest size, decent price)
      (2L, 1, 10.0),  // exact tie with 1 — BOTH survive (no strict edge)
      (3L, 1, 9.0),   // same size, lower price: dominated by 1
      (4L, 2, 10.0),  // bigger size, equal price: dominated by 1 (strict size)
      (5L, 2, 15.0),  // frontier (pays for its size with a better price)
      (6L, 3, 15.0),  // bigger size, equal price vs 5: dominated
      (7L, 4, 20.0),  // frontier
      (8L, 9, 1.0)    // dominated by everything
    ).toDF("id", "sz", "price")
      .union(Seq((9L, null.asInstanceOf[java.lang.Integer], 99.0))
        .toDF("id", "sz", "price"))
    val got = TopK.skyline2d(df, "sz", "price")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 5L, 7L))
    // independent brute force (anti-join on the dominance predicate)
    val base = df.filter(col("sz").isNotNull && col("price").isNotNull)
    val naive = base.as("a").join(base.as("b"),
        col("b.sz") <= col("a.sz") && col("b.price") >= col("a.price") &&
          (col("b.sz") < col("a.sz") || col("b.price") > col("a.price")),
        "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got === naive)
  }
}
