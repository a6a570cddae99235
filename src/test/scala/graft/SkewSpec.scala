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
