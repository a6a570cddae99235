package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew tools must be RESULT-TRANSPARENT: salted plans return exactly
  * what the unsalted plans return, on skewed and uniform data alike. */
class SkewSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // one hot key (90 rows of key 1) + a uniform tail
  private lazy val skewed = ((1 to 90).map(i => (1L, i.toLong, 1.0)) ++
    (1 to 10).map(i => (i.toLong + 1, i.toLong + 1000, 2.0)))
    .toDF("k", "row_id", "v")

  test("salt is deterministic and lands in [0, buckets)") {
    val salts = skewed.select(Skew.salt(col("row_id"), 8).as("s"))
      .as[Int].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = skewed.select(Skew.salt(col("row_id"), 8).as("s"))
      .as[Int].collect()
    assert(salts.toSeq === again.toSeq)
    assert(salts.distinct.length > 1, "salt must actually spread rows")
  }

  test("saltedAgg(sum, count) equals the direct groupBy aggregation") {
    val direct = skewed.groupBy(col("k").as("key"))
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, col("k"), col("row_id"), 8,
      partial = Seq(sum("v").as("psv"), count(lit(1)).as("pn")),
      merge = Seq(sum("psv").as("sv"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  /** VERDICT r10 #3: AQE's skew-join split asserted as a FACT, not an
    * assumption (IntervalJoin and the salting docs both lean on it for
    * moderate skew). Plant a join where one key owns ~2 MB of shuffle
    * bytes against a ~25 KB median, drop the skew thresholds into test
    * range, and pin that OptimizeSkewedJoin actually split the hot
    * partition — the final adaptive plan's SMJ carries (skew=true).
    * Thresholds are scaled, MECHANISM is identical to production: a
    * reduce partition is split when its bytes exceed
    * max(skewedPartitionThresholdInBytes, factor × median), and the
    * splits join the (duplicated) other side per sub-partition.
    * Manual salting (ops.Skew) remains for what AQE can NOT do: skewed
    * AGGREGATIONS (no skew-split exists for groupBy), and joins where
    * both sides of the hot key are large (AQE duplicates the other
    * side's matching partition per split — fine for dims, quadratic
    * for fact×fact hot keys). */
  test("AQE skew-join splits the planted hot partition (skew=true in the final plan)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536") {
      // ~512 B of md5-derived hex per row (incompressible enough that
      // lz4 can't shrink the hot partition under the threshold — a
      // constant pad would compress to nothing and defeat the plant).
      val payload = concat((0 until 16).map(i =>
        md5(concat(col("id"), lit(s":$i")))): _*)
      val fact = spark.range(0, 4320).select(
        when(col("id") < 4000, 0L)
          .otherwise(pmod(col("id"), lit(64L))).as("k"),
        col("id").as("row_id"), payload.as("payload"))
      val dim = spark.range(0, 64).select(
        col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, Seq("k"))
        .select(col("row_id"), col("payload"), col("name"))
      val rows = joined.collect()
      assert(rows.length === 4320, "skew split must not change results")
      assert(rows.map(_.getLong(0)).toSet === (0L until 4320L).toSet)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin did not engage on the planted hot key:\n$p")
    }
  }

  test("saltedJoin equals the plain equi join, including hot-key multiplicity") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "name")
    val direct = skewed.join(dim, Seq("k"))
      .select("k", "row_id", "v", "name").collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", col("row_id"), 8)
      .select("k", "row_id", "v", "name").collect().toSet
    assert(salted === direct)
    assert(direct.count(_.getLong(0) == 1L) === 90) // hot key fully joined
  }
}
