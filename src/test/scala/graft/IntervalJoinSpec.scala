package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bin-and-residual interval join: losslessness vs the naive theta
  * join, multi-bin pair dedup, and half-open boundary semantics. */
class IntervalJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("overlapJoin equals the naive inequality join on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_event"),
        unix_micros($"ts").as("p_start"))
      .withColumn("p_end", $"p_start" + 3600000000L)
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("c_event"),
        unix_micros($"ts").as("c_start"))
      .withColumn("c_end", $"c_start" + 600000000L)
    val binned = IntervalJoin.overlapJoin(p, "p_event", "p_start", "p_end",
        c, "c_event", "c_start", "c_end", Seq("user_id"), 1800000000L)
      .select("p_event", "c_event").as[(Long, Long)].collect().toSet
    val naive = p.join(c.withColumnRenamed("user_id", "cu"),
        $"user_id" === $"cu" && $"p_start" < $"c_end" && $"c_start" < $"p_end")
      .select("p_event", "c_event").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("a pair overlapping across many shared bins emits exactly one row") {
    // both intervals span 10 bins of width 10 → they meet in every bin
    val l = Seq((1L, "k", 0L, 100L)).toDF("lid", "k", "ls", "le")
    val r = Seq((2L, "k", 5L, 95L)).toDF("rid", "k", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
      r, "rid", "rs", "re", Seq("k"), binWidth = 10L)
    assert(out.count() === 1L)
  }

  test("negative coordinates bin at uniform width (true floor, not truncation)") {
    // with trunc-div, both of these land in 'bin 0' spanning (-10, 10)
    // and would pair; with true floor they sit in bins -1 and 0 and
    // the residual keeps them apart — but genuinely-overlapping pairs
    // across the origin still match.
    val l = Seq((1L, "k", -9L, -1L), (2L, "k", -3L, 4L)).toDF("lid", "k", "ls", "le")
    val r = Seq((10L, "k", 1L, 9L), (11L, "k", -5L, 2L)).toDF("rid", "k", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", Seq("k"), binWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // (1,-9..-1) × (10,1..9): disjoint. (1) × (11,-5..2): overlap.
    // (2,-3..4) × both: overlap.
    assert(out === Set((1L, 11L), (2L, 10L), (2L, 11L)))
    // and equivalence with the naive join on a negative-heavy fixture
    val naive = l.join(r.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"ls" < $"re" && $"rs" < $"le")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === naive)
  }

  test("half-open semantics: touching endpoints do not overlap; keys partition") {
    val l = Seq((1L, "a", 0L, 10L), (2L, "a", 50L, 60L)).toDF("lid", "k", "ls", "le")
    val r = Seq(
      (10L, "a", 10L, 20L),  // starts exactly at l1's end → NO overlap
      (11L, "a", 9L, 12L),   // overlaps l1's last unit
      (12L, "b", 0L, 100L)   // right key, wrong partition → never joins
    ).toDF("rid", "k", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", Seq("k"), binWidth = 16L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 11L)))
  }

  test("degenerate intervals (empty or inverted) are dropped, both sides") {
    // [5,5) is empty; [9,3) is inverted — half-open semantics say both
    // overlap nothing, but without the guard the empty one would pass
    // the residual against any interval straddling 5 and the inverted
    // one would explode a DESCENDING bin sequence.
    val l = Seq((1L, "k", 5L, 5L), (2L, "k", 9L, 3L), (3L, "k", 0L, 10L))
      .toDF("lid", "k", "ls", "le")
    val r = Seq((10L, "k", 2L, 8L), (11L, "k", 7L, 7L))
      .toDF("rid", "k", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", Seq("k"), binWidth = 4L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((3L, 10L)))
  }

  test("coalesceIntervals: overlap and touch merge, gaps split, keys are independent") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), // overlap + touch
      ("a", 40L, 50L), // gap → own island
      ("b", 0L, 10L), // same coords, other key
    ).toDF("k", "s", "e")
    val out = IntervalJoin.coalesceIntervals(iv, Seq("k"), "s", "e")
      .select("k", "start", "end", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L), ("b", 0L, 10L, 1L)))
  }

  test("coalesceIntervals: an early interval outlasting its successors holds the island open") {
    // lag(end) would see [30,40) after [10,20) and split; the running
    // max of ends must not.
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L),
      ("k", 150L, 160L)).toDF("k", "s", "e")
    val out = IntervalJoin.coalesceIntervals(iv, Seq("k"), "s", "e")
      .select("start", "end", "n_merged").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((0L, 100L, 3L), (150L, 160L, 1L)))
  }

  test("coalesceIntervals: degenerate rows are dropped, same contract as overlapJoin") {
    val iv = Seq(("k", 5L, 5L), ("k", 9L, 3L), ("k", 0L, 10L))
      .toDF("k", "s", "e")
    val out = IntervalJoin.coalesceIntervals(iv, Seq("k"), "s", "e")
      .select("start", "end", "n_merged").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((0L, 10L, 1L)))
  }
}
