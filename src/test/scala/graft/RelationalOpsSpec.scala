package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator unit tests on literal DataFrames with null/empty edges
  * (SURVEY.md §5.2 #1) — the oracle harness proves fixture-scale
  * correctness; these pin the semantics users hit at the margins. */
class RelationalOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("unionByName aligns by column NAME, not position") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id") // reversed order
    val got = a.unionByName(b).as[(Int, String)].collect().toSet
    assert(got === Set((1, "x"), (2, "y")))
  }

  test("except is set semantics; exceptAll preserves multiplicity") {
    val a = Seq(1, 1, 2, 3).toDF("v")
    val b = Seq(1).toDF("v")
    assert(a.except(b).as[Int].collect().sorted.toSeq === Seq(2, 3))
    assert(a.exceptAll(b).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("intersect of disjoint inputs is empty; with nulls, null matches null") {
    val a = Seq(Some(1), None).toDF("v")
    val b = Seq(Option.empty[Int]).toDF("v")
    assert(a.intersect(b).collect().map(_.isNullAt(0)).toSeq === Seq(true))
    assert(Seq(1).toDF("v").intersect(Seq(2).toDF("v")).isEmpty)
  }

  test("semi/anti join partition a table exactly (no duplication from the right side)") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val r = Seq((1, "x"), (1, "y")).toDF("k", "w") // duplicate keys on the right
    val semi = l.join(r, Seq("k"), "left_semi")
    val anti = l.join(r, Seq("k"), "left_anti")
    assert(semi.count() === 1) // row 1 once, despite 2 matches
    assert(anti.count() === 2)
    assert(semi.count() + anti.count() === l.count())
  }

  test("outer joins null-fill the non-matching side") {
    val l = Seq((1, "a")).toDF("k", "v")
    val r = Seq((2, "b")).toDF("k", "w")
    val full = l.join(r, Seq("k"), "full_outer").orderBy("k").collect()
    assert(full.length === 2)
    assert(full(0).getInt(0) === 1 && full(0).isNullAt(2))
    assert(full(1).getInt(0) === 2 && full(1).isNullAt(1))
  }

  test("groupBy on empty input yields zero groups; global agg yields one row") {
    val empty = Seq.empty[(Int, Int)].toDF("k", "v")
    assert(empty.groupBy("k").agg(sum("v")).isEmpty)
    val row = empty.agg(count(lit(1)).as("n"), sum("v").as("s")).collect()(0)
    assert(row.getLong(0) === 0L && row.isNullAt(1)) // SQL: SUM of nothing is NULL
  }

  test("aggregates skip nulls; count(*) does not") {
    val df = Seq(Some(1), None, Some(3)).toDF("v")
    val r = df.agg(count(lit(1)), count(col("v")), sum("v"), avg("v")).collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 4L)
    assert(r.getDouble(3) === 2.0) // avg over non-null values only
  }

  test("rollup emits per-group rows plus the grand total with NULL group keys") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val got = df.rollup("g").agg(sum("v").as("s"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, (null: String) -> 6L))
  }

  test("window rank vs dense_rank on ties; lag at partition start is null") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("p", 10), ("p", 10), ("p", 5)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(desc("v"))
    val r = df.select(col("v"), rank().over(w), dense_rank().over(w), lag("v", 1).over(w))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2), if (x.isNullAt(3)) -1 else x.getInt(3)))
    assert(r.toSeq === Seq((10, 1, 1, -1), (10, 1, 1, 10), (5, 3, 2, 10)))
  }

  test("orderBy.limit(k) on fewer than k rows returns all rows") {
    val df = Seq(3, 1, 2).toDF("v")
    assert(df.orderBy("v").limit(10).as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("distinct treats null as a value (one null group survives)") {
    val df = Seq(Some(1), None, None, Some(1)).toDF("v")
    assert(df.distinct().count() === 2)
  }
}
