package graft

import graft.functions.Udfs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extension-seam tests (SURVEY.md §2B "UDF surface"): scalar UDF,
  * Aggregator UDAF, typed flatMap table function. These stay OUT of the
  * oracle/bench query set by design — built-ins are preferred there. */
class UdfsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("scalar UDF: revenue(price, qty) = price * qty") {
    val got = Seq((10.5, 3L)).toDF("price", "qty")
      .select(Udfs.revenue(col("price"), col("qty"))).as[Double].head()
    assert(got === 31.5)
  }

  test("SimHash UDAF: identical token bags hash identically; near bags are close, far bags far") {
    def bag(id: Long, text: String) =
      text.split(" ").map(t => (id, t)).toSeq
    val toks = (bag(1, "the quick brown fox jumps over the lazy dog") ++
      bag(2, "the quick brown fox jumps over the lazy dog") ++
      bag(3, "the quick brown fox jumps over the lazy cat") ++
      bag(4, "totally unrelated corpus of completely different words"))
      .toDF("doc_id", "token")
    val sims = toks
      .groupBy("doc_id")
      .agg(Udfs.simhash(xxhash64(col("token"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)),
      s"near pair ${ham(sims(1L), sims(3L))} !< far pair ${ham(sims(1L), sims(4L))}")
  }

  test("hammingDist column function matches bitCount(xor)") {
    val got = Seq((0b1011L, 0b0110L)).toDF("a", "b")
      .select(Udfs.hammingDist(col("a"), col("b"))).as[Int].head()
    assert(got === java.lang.Long.bitCount(0b1011L ^ 0b0110L))
  }

  test("explodeShingles table function: one row per n-gram, partial windows dropped") {
    val out = Udfs.explodeShingles(
      Seq((1L, "a b c d"), (2L, "x")).toDS(), 2).collect().toSet
    assert(out === Set((1L, "a b"), (1L, "b c"), (1L, "c d")))
  }
}
