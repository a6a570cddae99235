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

  test("q38 approx_top_k: exact under capacity; dominant item survives over capacity") {
    import spark.implicits._
    def topk(toks: Seq[String], k: Int, cap: Int): Map[String, Long] =
      toks.toDF("t").agg(expr(s"approx_top_k(t, $k, $cap)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item"), col("e.count")).as[(String, Long)]
        .collect().toMap
    // UNDER capacity the sketch is a plain counting map — exact counts
    // (q38's oracle-ability rests on this: 64 ≥ the corpus' 31 tokens).
    val exact = topk(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"), 10, 10)
    assert(exact === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    // OVER capacity: a dominant item must survive eviction pressure
    // from 100 singletons with its estimate at or above its true count.
    val skewed = Seq.fill(200)("hot") ++ (1 to 100).map(i => s"cold$i")
    val r = topk(new scala.util.Random(1).shuffle(skewed), 5, 16)
    assert(r.contains("hot"), s"dominant item evicted: $r")
    assert(r("hot") >= 200L, s"estimate below true count: ${r("hot")}")
  }

  test("count_min_sketch estimates are exact-or-over, within eps·N") {
    import spark.implicits._
    // The CMS guarantee: estimate >= true count always (hash collisions
    // only ADD), and <= true + eps·N with probability `confidence`.
    // Fixed seed ⇒ deterministic, so the bound is assertable outright.
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val eps = 0.001
    val bytes = toks.agg(expr(s"count_min_sketch(token, CAST($eps AS DOUBLE), 0.99d, 42)"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = toks.groupBy("token").count().as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    for ((tok, cnt) <- exact) {
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"$tok: CMS under-counted ($est < $cnt)")
      assert(est <= cnt + (eps * n).toLong + 1, s"$tok: est $est exceeds bound")
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
