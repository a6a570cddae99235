package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two laws that make persisted sketch rollups trustworthy at
  * scale (q127): lossless windowed merge and bounded estimate error. */
class SketchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def events = Tables.events(spark, sfDir)
    .withColumn("day", to_date(col("ts")))

  test("windowed sketches union losslessly: rollup estimate equals single-pass") {
    val daily = Sketch.buildSketches(events, "user_id", lgK = 12,
      col("event_type"), col("day"))
    val rolled = Sketch.rollupSketches(daily, col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    val singlePass = Sketch.buildSketches(events, "user_id", lgK = 12,
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    // HLL union is register-wise max: splitting by window costs ZERO
    // accuracy — exact equality, not approximate
    assert(rolled === singlePass)
    assert(rolled.nonEmpty)
  }

  /** VERDICT r10 #4: the pattern's deployment shape closed end to end —
    * sketch rows PERSISTED day-partitioned, read back in a fresh plan,
    * range-filtered, unioned — must equal the in-session single pass
    * over the same range EXACTLY (the binary sketch column must
    * round-trip parquet bit-identically for register-max union to be
    * lossless through storage). */
  test("persisted rollup table: read-back union equals single-pass over the range") {
    val path = TempDirs.scratch("graft-sketch-spec-")
    graft.pipeline.Warehouse.writePartitioned(
      Sketch.buildSketches(events, "user_id", lgK = 12,
        col("event_type"), col("day")),
      path, "day")
    val cutoff = lit("2024-01-16").cast("date")
    val persisted = Sketch.rollupSketches(
        spark.read.parquet(path).filter(col("day") < cutoff),
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    val singlePass = Sketch.buildSketches(
        events.filter(col("day") < cutoff), "user_id", lgK = 12,
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    assert(persisted === singlePass)
    assert(persisted.nonEmpty)
    // the range filter must genuinely subset the sketch table (the
    // ESTIMATES may legitimately coincide — every fixture user is
    // active in both halves of the month at tiny SF — but the filtered
    // row count cannot equal the full table's)
    val all = spark.read.parquet(path).count()
    val filtered = spark.read.parquet(path).filter(col("day") < cutoff).count()
    assert(filtered > 0 && filtered < all,
      s"range filter had no effect ($filtered of $all) — test is vacuous")
  }

  /** q138's law: the RANGE-frame rolling union over daily sketches is
    * the SAME sketch a direct single pass over that window's raw
    * events would build — per (type, day), exactly — and its estimate
    * tracks the exact trailing-7-day distinct within the envelope. */
  test("rolling 7-day union equals single-pass per window; tracks exact distinct") {
    val rolling = SparkEntry.queries("q138_sliding_distinct")(spark, sfDir)
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (t, d, e) => (t, d.toString) -> e }.toMap
    assert(rolling.nonEmpty)
    // spot-check a handful of (type, day) windows against a direct
    // sketch built from the raw events of exactly that 7-day range —
    // lossless merge means EXACT estimate equality, not approximate
    val picks = rolling.keys.toSeq.sortBy(identity).zipWithIndex
      .filter(_._2 % 7 == 3).map(_._1).take(6)
    for ((tpe, day) <- picks) {
      val direct = Sketch.buildSketches(
          events.filter(col("event_type") === tpe &&
            col("day").between(date_sub(lit(day).cast("date"), 6), lit(day).cast("date"))),
          "user_id", lgK = 12, col("event_type"))
        .select(Sketch.estimate(col("hll"))).as[Long].head()
      assert(rolling((tpe, day)) === direct,
        s"($tpe, $day): rolling ${rolling((tpe, day))} != single-pass $direct")
      val exact = events.filter(col("event_type") === tpe &&
          col("day").between(date_sub(lit(day).cast("date"), 6), lit(day).cast("date")))
        .select(countDistinct("user_id")).as[Long].head()
      val rel = math.abs(rolling((tpe, day)) - exact).toDouble / exact
      assert(rel < 0.05, s"($tpe, $day): est ${rolling((tpe, day))} vs exact $exact")
    }
  }

  test("rollup estimate tracks exact distinct within the lgK error envelope") {
    val est = Sketch.rollupSketches(
        Sketch.buildSketches(events, "user_id", lgK = 12,
          col("event_type"), col("day")),
        col("event_type"))
      .select(col("event_type"), Sketch.estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    // lgK 12 ⇒ ~1.04/sqrt(4096) ≈ 1.6% relative standard error; 5%
    // is a >3-sigma bound on the fixture cardinalities
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k) - n).toDouble / n
      assert(rel < 0.05, s"$k: est ${est(k)} vs exact $n (rel $rel)")
    }
  }

  test("estimateIntersection tracks a planted overlap; disjoint sets clamp to ~0") {
    // A = 0..3999, B = 3000..6999 → true overlap 1000
    val a = spark.range(0, 4000).agg(expr("hll_sketch_agg(id, 12)").as("ha"))
    val b = spark.range(3000, 7000).agg(expr("hll_sketch_agg(id, 12)").as("hb"))
    val inter = a.crossJoin(b)
      .select(Sketch.estimateIntersection(col("ha"), col("hb")).as("i"))
      .as[Double].head()
    // inclusion-exclusion compounds three ~1.6% errors on 4k-sized
    // terms → absolute slack ~3*64 ≈ 200 on a true 1000
    assert(math.abs(inter - 1000.0) < 250, s"overlap estimate $inter")
    val dis = spark.range(0, 4000).agg(expr("hll_sketch_agg(id, 12)").as("ha"))
      .crossJoin(spark.range(10000, 14000).agg(expr("hll_sketch_agg(id, 12)").as("hb")))
      .select(Sketch.estimateIntersection(col("ha"), col("hb")).as("i"))
      .as[Double].head()
    assert(dis < 250, s"disjoint estimate should be near zero, got $dis")
  }

  test("countMin: never undercounts, and a wide sketch is exact") {
    // 100 keys, key k occurring (k % 7) + 1 times
    val rows = (0L until 100L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k))
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keys = exact.keys.toSeq.toDF("k")
    // width 16 << 100 keys: collisions guaranteed, estimates only go UP
    val narrow = Sketch.countMinEstimate(
        Sketch.countMinBuild(df, "k", 4, 16, 3L), keys, "k", 4, 16, 3L)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(narrow(k) >= n, s"undercount at $k: ${narrow(k)} < $n")
    }
    assert(narrow.exists { case (k, e) => e > exact(k) },
      "width 16 with 100 keys should produce at least one collision")
    // width 4096 >> 100 keys: md5 buckets collide with prob ~1 - the
    // birthday bound; for THIS seed/keys there are none (deterministic)
    val wide = Sketch.countMinEstimate(
        Sketch.countMinBuild(df, "k", 4, 4096, 3L), keys, "k", 4, 4096, 3L)
      .as[(Long, Long)].collect().toMap
    assert(wide === exact)
  }

  test("countMin: merged counters over a split equal the single-pass build") {
    val rows = (0L until 60L).map(k => k % 13).toDF("k")
    val h1 = rows.filter(col("k") % 2 === 0)
    val h2 = rows.filter(col("k") % 2 =!= 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("r", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    val merged = Sketch.countMinMerge(
      Sketch.countMinBuild(h1, "k", 3, 32, 9L),
      Sketch.countMinBuild(h2, "k", 3, 32, 9L))
    val single = Sketch.countMinBuild(rows, "k", 3, 32, 9L)
    assert(canon(merged) === canon(single))
  }

  test("countMinInnerProduct: never below the true join size; disjoint keys can still collide upward") {
    // A: key k appears (k % 3) + 1 times for k in 0..39
    // B: key k appears (k % 5) + 1 times for k in 20..59
    val aRows = (0L until 40L).flatMap(k => Seq.fill((k % 3).toInt + 1)(k))
    val bRows = (20L until 60L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k))
    val trueSize = (20L until 40L)
      .map(k => ((k % 3) + 1) * ((k % 5) + 1)).sum
    val est = Sketch.countMinInnerProduct(
        Sketch.countMinBuild(aRows.toDF("k"), "k", 4, 64, 21L),
        Sketch.countMinBuild(bRows.toDF("k"), "k", 4, 64, 21L))
      .as[Long].head()
    assert(est >= trueSize, s"inner product $est under true size $trueSize")
    // a wide sketch tightens the estimate toward exact
    val wide = Sketch.countMinInnerProduct(
        Sketch.countMinBuild(aRows.toDF("k"), "k", 4, 4096, 21L),
        Sketch.countMinBuild(bRows.toDF("k"), "k", 4, 4096, 21L))
      .as[Long].head()
    assert(wide >= trueSize && wide <= est)
  }

  test("countMin: a key absent from the build estimates >= 0, never negative") {
    val built = Sketch.countMinBuild(Seq(1L, 2L, 3L).toDF("k"), "k", 4, 8, 5L)
    val est = Sketch.countMinEstimate(built, Seq(99L).toDF("k"), "k", 4, 8, 5L)
      .as[(Long, Long)].collect().toMap
    assert(est(99L) >= 0L)
  }

  // ---- KLL quantile sketches (q319's machinery) ----

  /** Inclusive order statistic: smallest v with #{x ≤ v}/n ≥ rank —
    * the library's INCLUSIVE criterion, computed naively. */
  private def exactInclusiveQuantile(sorted: Seq[Double], rank: Double): Double = {
    val n = sorted.size
    sorted.find(v => sorted.count(_ <= v).toDouble / n >= rank).get
  }

  test("KLL at capacity: quantiles ARE the inclusive order statistics (no compaction)") {
    // n = 500 < k = 800: every item is retained, so the sketch answer
    // must EQUAL the exact order statistic at every rank — the
    // exact-at-capacity law that makes under-capacity deployments
    // (small groups, short windows) lossless.
    val values = new scala.util.Random(7).shuffle((1 to 500).toVector)
      .map(_.toDouble)
    val df = spark.createDataFrame(
      values.map(Tuple1(_))).toDF("v").repartition(8)
    val sk = df.agg(call_function("graft_kll_agg",
      col("v"), lit(800)).as("kll"))
    for (r <- Seq(0.01, 0.25, 0.5, 0.9, 0.999, 1.0)) {
      val got = sk.select(Sketch.kllQuantile(col("kll"), r)).as[Double].head()
      assert(got === exactInclusiveQuantile(values.sorted, r),
        s"rank $r: sketch $got != exact order statistic")
    }
    assert(sk.select(Sketch.kllN(col("kll"))).as[Long].head() === 500L)
  }

  test("KLL merge at capacity equals single-pass; empty group quantile is null; nulls skipped") {
    val values = (1 to 400).map(_.toDouble)
    val grouped = values.map(v => (if (v <= 200) "a" else "b", v))
    val df = spark.createDataFrame(grouped).toDF("g", "v").repartition(8)
    // per-group build → merge (the rollup read path), all under
    // capacity: must equal the exact order statistics of the union
    val merged = Sketch.rollupKllSketches(
      Sketch.buildKllSketches(df, col("v"), k = 800, col("g")))
    for (r <- Seq(0.1, 0.5, 0.95))
      assert(merged.select(Sketch.kllQuantile(col("kll"), r)).as[Double].head()
        === exactInclusiveQuantile(values.sorted, r), s"merged rank $r")
    // nulls are skipped (SQL aggregate convention): n stays exact
    val withNulls = spark.createDataFrame(
        Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0))))
      .toDF("g", "v")
    val n = Sketch.buildKllSketches(withNulls, col("v"), k = 200, col("g"))
      .select(Sketch.kllN(col("kll"))).as[Long].head()
    assert(n === 2L)
    // an all-null group yields an empty sketch: quantile null, n = 0
    val empty = Sketch.buildKllSketches(
        spark.createDataFrame(Seq(("a", Option.empty[Double]))).toDF("g", "v"),
        col("v"), k = 200, col("g"))
      .select(Sketch.kllN(col("kll")).as("n"),
        Sketch.kllQuantile(col("kll"), 0.5).as("q"))
    val row = empty.collect().head
    assert(row.getLong(0) === 0L && row.isNullAt(1))
  }

  test("KLL over capacity: estimates stay inside the published rank-error envelope") {
    // n = 20000 >> k = 200 forces compaction; the returned quantile's
    // TRUE rank must sit within 2× the two-sided normalized rank
    // error bound (~1.65% at k = 200; 2× because the library bound is
    // ~99% confidence, and the test must not flake on the coin).
    val n = 20000
    val values = new scala.util.Random(11).shuffle((1 to n).toVector)
      .map(_.toDouble)
    val df = spark.createDataFrame(values.map(Tuple1(_))).toDF("v")
      .repartition(16)
    val sk = df.agg(call_function("graft_kll_agg",
      col("v"), lit(200)).as("kll"))
    val eps = graft.expressions.KllExpressions.normalizedRankError(200)
    assert(eps > 0 && eps < 0.03, s"unexpected envelope $eps")
    for (r <- Seq(0.1, 0.5, 0.95, 0.99)) {
      val got = sk.select(Sketch.kllQuantile(col("kll"), r)).as[Double].head()
      val trueRank = got / n // values are 1..n, so rank(v) = v/n
      assert(math.abs(trueRank - r) <= 2 * eps,
        s"rank $r: got value $got (true rank $trueRank), envelope $eps")
    }
    assert(sk.select(Sketch.kllN(col("kll"))).as[Long].head() === n.toLong)
  }

  test("KLL rolling merge (q321): trailing-window quantiles equal exact order statistics at capacity; gaps stay gaps") {
    // 3 "days" per group, all under capacity (no compaction), with a
    // CALENDAR GAP: day indices 0, 1, 5 — the RANGE frame must union
    // only days within 2 of each output day, so day 5's window is
    // {5} alone (a ROWS frame would wrongly include day 1).
    val rows = Seq(
      (0, Seq(1.0, 2.0, 3.0)), (1, Seq(10.0, 20.0)), (5, Seq(100.0)))
      .flatMap { case (d, vs) => vs.map(v => ("g", d, v)) }
    val df = spark.createDataFrame(rows).toDF("g", "d", "v").repartition(4)
    val daily = Sketch.buildKllSketches(df, col("v"), k = 800,
      col("g"), col("d"))
    val got = daily.withColumn("kll3", Sketch.kllRollingMerge(col("kll"),
        Seq(col("g")), col("d"), windows = 3))
      .select(col("d"), Sketch.kllN(col("kll3")).as("n"),
        Sketch.kllQuantile(col("kll3"), 0.5).as("p50"))
      .as[(Int, Long, Double)].collect()
      .map { case (d, n, p) => d -> ((n, p)) }.toMap
    // day 0: {1,2,3}; day 1: {1,2,3,10,20}; day 5: {100} alone
    assert(got(0) === ((3L, 2.0)))
    assert(got(1) === ((5L, 3.0)))
    assert(got(5) === ((1L, 100.0)), "calendar gap must reset the window")
  }

  test("KLL persisted rollup (q319 lifecycle): day-partitioned read-back merge within envelope of exact") {
    val path = TempDirs.scratch("graft-kll-spec-")
    val ev = events.filter(col("value").isNotNull)
    graft.pipeline.Warehouse.writePartitioned(
      Sketch.buildKllSketches(ev, col("value"), k = 200,
        col("event_type"), col("day")),
      path, "day")
    val cutoff = lit("2024-01-16").cast("date")
    val got = Sketch.rollupKllSketches(
        spark.read.parquet(path).filter(col("day") < cutoff),
        col("event_type"))
      .select(col("event_type"), Sketch.kllN(col("kll")).as("n"),
        Sketch.kllQuantile(col("kll"), 0.5).as("p50"))
      .as[(String, Long, Double)].collect()
      .map { case (t, nn, p) => t -> ((nn, p)) }.toMap
    val exact = ev.filter(col("day") < cutoff)
      .groupBy("event_type")
      .agg(count("value").as("n"),
        expr("percentile(value, 0.5)").as("p50x"),
        expr("percentile(value, 0.45)").as("lo"),
        expr("percentile(value, 0.55)").as("hi"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (t, nn, p, lo, hi) => t -> ((nn, p, lo, hi)) }.toMap
    assert(got.keySet === exact.keySet && got.nonEmpty)
    for ((t, (nn, p50)) <- got) {
      // counts are exact THROUGH parquet round-trip and merge
      assert(nn === exact(t)._1, s"$t: n $nn != ${exact(t)._1}")
      // the median estimate lands within a generous ±5%-rank band
      // (envelope is ~1.65%; the band proves the value is a real
      // median, not a corrupted deserialization)
      assert(p50 >= exact(t)._3 && p50 <= exact(t)._4,
        s"$t: p50 $p50 outside [${exact(t)._3}, ${exact(t)._4}]")
    }
  }
}
