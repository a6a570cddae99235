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

  test("audit evaluates all checks in one scan and reports failures honestly") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")), (4L, Option("a")))
      .toDF("id", "s")
    val n = count(lit(1)).cast("double")
    val out = Profile.audit(df, Seq(
      ("complete_s", count(col("s")) / n, 1.0),     // 0.75 → fail
      ("unique_id", countDistinct(col("id")) / n, 1.0))) // 1.0 → pass
      .orderBy("check_name")
      .as[(String, Double, Double, Boolean)].collect()
    assert(out === Array(
      ("complete_s", 0.75, 1.0, false),
      ("unique_id", 1.0, 1.0, true)))
    val plan = Profile.audit(Tables.orders(spark, sfDir), Seq(
      ("c", count(col("o_custkey")) / count(lit(1)).cast("double"), 1.0)))
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"expected exactly one file scan:\n$plan")
  }

  test("audit rejects an empty check suite") {
    intercept[IllegalArgumentException] {
      Profile.audit(Seq(1).toDF("x"), Seq.empty)
    }
  }

  test("equi-depth histogram: buckets partition all rows, never split a value") {
    // 0..99 uniform ⇒ 4 buckets of exactly 25; a massive tie at one
    // value must land in ONE bucket even though it overflows the depth
    val uniform = (0 until 100).map(i => i.toLong).toDF("v")
    val h1 = Profile.equiDepthHistogram(uniform, "v", 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(h1.map(_._4).toSeq === Seq(25L, 25L, 25L, 25L))
    assert(h1.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // 60 copies of value 5 + 40 distinct others: the tie overflows its
    // bucket but never splits; totals still partition
    val skewed = ((1 to 60).map(_ => 5L) ++ (100L until 140L)).toDF("v")
    val h2 = Profile.equiDepthHistogram(skewed, "v", 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(h2.map(_._4).sum === 100L)
    assert(h2.count(r => r._2 <= 5L && 5L <= r._3) === 1,
      "the tied value must appear in exactly one bucket's range")
    // nulls are excluded, not a bucket
    val withNulls = Seq(Option(1L), None, Option(2L), Option(3L), None).toDF("v")
    val h3 = Profile.equiDepthHistogram(withNulls, "v", 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(h3.map(_._4).sum === 3L)
  }

  test("equi-depth histogram scans the table once (total rides the cum window)") {
    val plan = Profile.equiDepthHistogram(
        Tables.lineitem(spark, sfDir), "l_extendedprice", 8)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one scan:\n$plan")
  }

  test("runningTotalByRange equals the single-partition window, ids agree via exchange reuse") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // values deliberately unsorted and duplicated across input partitions
    val rows = (0 until 997).map(i => ((i * 7919) % 499).toLong -> 1L)
    val df = rows.toDF("k", "n").repartition(13)
    // single-window truth at DISTINCT-key granularity (equal keys
    // co-locate under range partitioning, so compare on the collapsed
    // frequency table where the running total is well-defined)
    val freq = df.groupBy("k").agg(sum("n").as("n"))
    val truth = freq
      .withColumn("running_total", sum(col("n")).over(Window.orderBy("k")))
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    val fast = Profile.runningTotalByRange(freq, "k", "n", 8)
      .select("k", "n", "running_total")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(fast === truth)
    // the two __pid branches must hang off ONE range exchange
    val q = Profile.runningTotalByRange(freq, "k", "n", 8)
    q.collect()
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
           finalPlan.contains("ShuffleQueryStage"),
      s"expected the range exchange to be shared:\n$finalPlan")
  }

  test("groupChecksum: order/partitioning-invariant, row-change and dup sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, desc}
    val df = Seq(("g", 1L, "x"), ("g", 2L, "y"), ("h", 3L, "z"))
      .toDF("grp", "id", "v")
    def sums(d: org.apache.spark.sql.DataFrame) =
      Profile.groupChecksum(d, "grp", concat_ws("|", col("id"), col("v")))
        .select("grp", "n_rows", "checksum")
        .as[(String, Long, Long)].collect().toSet
    val base = sums(df)
    assert(sums(df.repartition(5).sortWithinPartitions(desc("v"))) === base)
    // one changed byte flips the group's checksum, leaves the other alone
    val mutated = sums(Seq(("g", 1L, "x"), ("g", 2L, "Y"), ("h", 3L, "z"))
      .toDF("grp", "id", "v"))
    assert(mutated !== base)
    assert(mutated.filter(_._1 == "h") === base.filter(_._1 == "h"))
    // a doubled row must NOT checksum-match (multiset semantics)
    val doubled = sums(df.unionAll(df.filter(col("id") === 1L)))
    assert(doubled.filter(_._1 == "g") !== base.filter(_._1 == "g"))
  }

  test("benford: digit extraction, zero-observation digits, sub-unit exclusion") {
    // one value per digit 1..9 (at mixed magnitudes), plus excluded rows
    val vals = Seq(1.5, 23.0, 390.25, 4.0, 5999.0, 61.0, 7.25, 800.0, 9.99,
      0.5, 0.0, -3.0) // < 1: excluded
    val out = Profile.benford(vals.toDF("v"), "v")
      .select("digit", "n_obs", "p_obs", "p_exp", "chi_term")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (1 to 9))
    assert(out.forall(_._2 == 1L))
    assert(out.forall(r => math.abs(r._3 - 1.0 / 9) < 1e-8))
    // expected shares are the Benford curve, and they sum to 1
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-6)
    assert(math.abs(out.head._4 - math.log10(2.0)) < 1e-6)
    // a digit with NO observations still gets its row
    val sparse = Profile.benford(Seq(100.0, 150.0).toDF("v"), "v")
      .select("digit", "n_obs").as[(Int, Long)].collect().toMap
    assert(sparse(1) === 2L && sparse(9) === 0L && sparse.size === 9)
  }

  test("gini: 0 on equal values, (n-1)/n on total concentration, negatives dropped") {
    val eq = Profile.gini(
        Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 5.0)).toDF("g", "id", "v"),
        Seq("g"), "v", "id")
      .select("gini").as[Double].head()
    assert(eq === 0.0)
    // x = (0, 0, 0, 10): G = (2*40 - 5*10) / (4*10) = 0.75 = (n-1)/n
    val conc = Profile.gini(
        Seq(("g", 1L, 0.0), ("g", 2L, 0.0), ("g", 3L, 0.0), ("g", 4L, 10.0))
          .toDF("g", "id", "v"),
        Seq("g"), "v", "id")
      .select("gini").as[Double].head()
    assert(conc === 0.75)
    // negatives are dropped before ranking; all-zero groups yield null
    val out = Profile.gini(
        Seq(("g", 1L, -5.0), ("g", 2L, 3.0), ("g", 3L, 3.0),
          ("z", 4L, 0.0), ("z", 5L, 0.0)).toDF("g", "id", "v"),
        Seq("g"), "v", "id")
      .select("g", "n", "gini").as[(String, Long, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("g" -> ((2L, Some(0.0))), "z" -> ((2L, None))))
  }
}
