package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling/splitting operators: content-addressed determinism,
  * partition invariance, fraction tolerance. */
class SamplingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("hashSplit is a pure function of the key: known value, partition-invariant") {
    // md5("a") = 0cc175b9... → "0c" < "cc" → train
    val one = Seq(Tuple1("a")).toDF("k")
    assert(Sampling.hashSplit(one, "k", "cc").select("split").as[String].head() === "train")

    val docs = Tables.documents(spark, sfDir)
    val base = Sampling.hashSplit(docs, "text", "cc")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val reparted = Sampling.hashSplit(docs.repartition(7), "text", "cc")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(base === reparted, "split labels must not depend on partitioning")
  }

  test("hashSplit train fraction tracks the threshold prefix mass") {
    // "cc" → 204/256 ≈ 0.797; n = 500, σ ≈ 0.018 → assert within ±0.08.
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count().toDouble
    val train = Sampling.hashSplit(docs, "text", "cc")
      .filter(col("split") === "train").count().toDouble
    assert(math.abs(train / n - 204.0 / 256.0) < 0.08,
      s"train fraction ${train / n} far from ${204.0 / 256.0}")
  }

  test("upsampleByWeight: copy counts bracket the weight, deterministic, partition-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val weights = Map("src0" -> 2.5, "src1" -> 1.25, "src2" -> 0.4)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.upsampleByWeight(df, "source", "doc_id", weights,
          defaultWeight = 1.0, seed = 11L)
        .groupBy("doc_id", "source").agg(max("copy").as("n"))
        .as[(Long, String, Int)].collect()
    val rows = run(docs)
    // every doc's copy count is floor(w) or floor(w)+1 for ITS source
    rows.foreach { case (id, src, n) =>
      val w = weights.getOrElse(src, 1.0)
      val lo = math.floor(w).toInt
      val hi = if (w == lo.toDouble) lo else lo + 1
      assert(n == lo || n == hi, s"doc $id ($src, w=$w): got $n copies")
    }
    // unweighted sources get EXACTLY one copy; src2 (w=0.4) drops some
    // docs entirely (count 0 rows are absent) but keeps at most 1
    assert(rows.filter(r => !weights.contains(r._2)).forall(_._3 == 1))
    // the copy index is a dense 1..n sequence, not just a count
    val copies = Sampling.upsampleByWeight(docs, "source", "doc_id", weights,
        defaultWeight = 1.0, seed = 11L)
      .filter(col("source") === "src0")
      .groupBy("doc_id").agg(sort_array(collect_list("copy")).as("cs"),
        max("copy").as("n"))
      .as[(Long, Seq[Int], Int)].collect()
    copies.foreach { case (id, cs, n) =>
      assert(cs == (1 to n), s"doc $id: copies $cs not dense 1..$n") }
    // determinism + partition invariance (the content-addressed claim)
    assert(run(docs).toSet === run(docs.repartition(7)).toSet)
    // expansion factor tracks the mixture: src0 at 2.5× over 25 docs
    val src0 = rows.filter(_._2 == "src0").map(_._3.toLong).sum.toDouble
    assert(math.abs(src0 / 25.0 - 2.5) < 0.5, s"src0 expansion ${src0 / 25.0}")
  }

  test("hashSplit rejects non-hex thresholds") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplitLabel(col("x"), "CZ")
    }
  }

  test("stratifiedSample: deterministic, partition-invariant, subset, fraction in tolerance") {
    val docs = Tables.documents(spark, sfDir)
    val fractions = Map("en" -> 0.5, "es" -> 0.2, "fr" -> 0.2, "de" -> 0.1, "zh" -> 0.1)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "lang", "doc_id", fractions, seed = 7L)
        .select("doc_id").as[Long].collect().toSet
    val a = run(docs)
    assert(a === run(docs), "same seed must give the same kept-set")
    assert(a === run(docs.repartition(7)),
      "kept-set must not depend on partitioning (the sampleBy rand() trap)")
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(all))
    val perLang = Sampling.stratifiedSample(docs, "lang", "doc_id", fractions, seed = 7L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, frac) <- fractions; total <- totals.get(lang)) {
      val got = perLang.getOrElse(lang, 0L).toDouble / total
      // Bernoulli: σ = sqrt(p(1-p)/n); strata are ~100 docs at sf0.001
      // so allow a generous ±0.2 absolute.
      assert(math.abs(got - frac) < 0.2, s"$lang sampled $got vs $frac")
    }
  }

  test("groupSample keeps exactly min(k, group size) rows, partition-invariant") {
    val docs = Tables.documents(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.groupSample(df, "lang", "doc_id", 5)
        .select("doc_id").as[Long].collect().toSet
    val kept = run(docs)
    assert(kept === run(docs.repartition(7)),
      "kept-set must not depend on partitioning")
    val perLang = Sampling.groupSample(docs, "lang", "doc_id", 5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, total) <- totals)
      assert(perLang(lang) === math.min(5L, total), s"$lang")
    // tiny-group edge: k larger than the group keeps the whole group
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    assert(Sampling.groupSample(tiny, "lang", "doc_id", 5).count() === 3L)
  }

  test("balancedShards: round-robin within (group, bucket), balanced, deterministic") {
    // 20 same-size docs in one (lang, bucket) window: doc i → shard i % 4.
    val uniform = (0 until 20).map(i => (i.toLong, "en", 10L))
      .toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.balancedShards(uniform, "doc_id", "n_tokens",
        numShards = 4, bucketWidth = 32, col("lang"))
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert((0 until 20).forall(i => got(i.toLong) === i % 4))
    // mixed sizes + languages: every (lang, bucket) cell spreads to
    // within one row per shard, and assignment is partition-invariant.
    val mixed = (0 until 97).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else "de", (i * 7 % 200).toLong))
      .toDF("doc_id", "lang", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.balancedShards(df, "doc_id", "n_tokens",
        numShards = 4, bucketWidth = 32, col("lang"))
    val out = run(mixed)
    val cellCounts = out
      .groupBy(col("lang"), floor(col("n_tokens") / 32.0).as("bucket"), col("shard"))
      .count().as[(String, Long, Long, Long)].collect()
      .groupBy(t => (t._1, t._2)).values
    for (cell <- cellCounts) {
      val counts = cell.map(_._4)
      assert(counts.max - counts.min <= 1,
        s"cell ${cell.head._1}/${cell.head._2} unbalanced: ${counts.toSeq}")
    }
    assert(out.collect().toSet === run(mixed.repartition(7)).collect().toSet,
      "shard assignment must not depend on partitioning")
  }

  test("mixturePlan: rates cap at 1, planned tokens track budget·weight, defaults apply") {
    val docs = Seq(
      ("a", 10L), ("a", 10L),         // a: 20 tokens
      ("b", 100L), ("b", 100L),       // b: 200 tokens
      ("c", 50L))                     // c: 50 tokens, default weight
      .toDF("source", "n_tokens")
    val plan = Sampling.mixturePlan(docs, "source", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5), defaultWeight = 0.1,
        tokenBudget = 100.0)
      .as[(String, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: budget·w = 50 > 20 available → rate caps at 1, yields all 20
    assert(plan("a") === ("a", 2L, 20L, 0.5, 1.0, 20L))
    // b: 50 of 200 → rate 0.25 → 50 tokens
    assert(plan("b") === ("b", 2L, 200L, 0.5, 0.25, 50L))
    // c: default weight 0.1 → 10 of 50 → rate 0.2 → 10 tokens
    assert(plan("c") === ("c", 1L, 50L, 0.1, 0.2, 10L))
  }

  test("trainingShuffle: partition-invariant, balanced shards, key decorrelates from id order") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val base = Sampling.trainingShuffle(docs, "doc_id", seed = 7, numShards = 8)
      .select("doc_id", "shard", "shuffle_key")
      .as[(Long, Long, String)].collect()
    val reparted = Sampling.trainingShuffle(docs.repartition(13), "doc_id",
        seed = 7, numShards = 8)
      .select("doc_id", "shard", "shuffle_key")
      .as[(Long, Long, String)].collect()
    assert(base.toSet === reparted.toSet, "assignment must be content-addressed")
    // md5 uniformity: every shard within ±40% of n/8 on the fixture
    val n = base.length
    val byShard = base.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.keys.toSet.subsetOf((0L until 8L).toSet))
    assert(byShard.values.forall(c =>
      c > n / 8 * 0.6 && c < n / 8 * 1.4), s"unbalanced shards: ${byShard.toMap}")
    // the permutation actually shuffles: within a shard, ordering by
    // shuffle_key must not be the id ordering
    val oneShard = base.filter(_._2 == base.head._2)
    val byKey = oneShard.sortBy(_._3).map(_._1).toSeq
    assert(byKey !== byKey.sorted, "shuffle_key order degenerated to id order")
    // a different seed is a different permutation
    val reseeded = Sampling.trainingShuffle(docs, "doc_id", seed = 8, numShards = 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val moved = base.count { case (id, sh, _) => reseeded(id) != sh }
    assert(moved > n / 2, "reseeding must reassign most rows")
  }

  test("temperatureMixture: alpha=1 is proportional; lower alpha flattens toward uniform") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), length(col("text")).as("n_tokens"))
    def weights(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixture(docs, "source", "n_tokens", alpha, 10000.0)
        .select("source", "weight").as[(String, Double)].collect().toMap
    val w1 = weights(1.0)
    val p = Sampling.temperatureMixture(docs, "source", "n_tokens", 1.0, 10000.0)
      .select("source", "p").as[(String, Double)].collect().toMap
    // alpha = 1: weight == p (both rounded to 6)
    w1.foreach { case (s, w) => assert(math.abs(w - p(s)) < 2e-6, s"$s: $w vs ${p(s)}") }
    assert(math.abs(w1.values.sum - 1.0) < 1e-4)
    // alpha < 1 flattens: the smallest stratum gains, the largest loses
    val w3 = weights(0.3)
    val smallest = p.minBy(_._2)._1
    val largest = p.maxBy(_._2)._1
    assert(w3(smallest) > w1(smallest), "low-resource stratum must upweight")
    assert(w3(largest) < w1(largest), "dominant stratum must downweight")
    assert(math.abs(w3.values.sum - 1.0) < 1e-4)
  }

  test("weightedSample: partition-invariant, k respected, biased toward heavy rows") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    def sample(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.weightedSample(df, "doc_id", col("n_chars").cast("double"),
          k = 50, seed = 11L)
        .select("doc_id").as[Long].collect().toSeq.sorted
    val base = sample(docs)
    assert(base.length === 50)
    assert(sample(docs.repartition(13)) === base, "content-addressed ⇒ partition-invariant")
    // P(selected) ∝ n_chars: the sample's mean length must exceed the
    // corpus mean by a comfortable statistical margin
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = docs.filter(col("doc_id").isin(base: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.05,
      s"weighting has no effect: sample $sampleMean vs corpus $corpusMean")
    // reseeding draws a substantially different sample
    val reseeded = Sampling.weightedSample(docs, "doc_id",
        col("n_chars").cast("double"), k = 50, seed = 12L)
      .select("doc_id").as[Long].collect().toSet
    assert((reseeded -- base.toSet).size > 10)
  }

  test("weightedSample: null/zero/negative weights cannot preempt the sample") {
    // null es_key sorts NULLS FIRST and a negative weight flips the key
    // sign — without the guard these three rows would occupy the whole
    // k=2 sample regardless of the honest rows' weights.
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)),
      (3L, None), (4L, Some(0.0)), (5L, Some(-7.0))
    ).toDF("doc_id", "w")
    val kept = Sampling.weightedSample(df, "doc_id", col("w"), k = 2, seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("stratifiedSample drops strata absent from the fractions map") {
    val docs = Tables.documents(spark, sfDir)
    val onlyEn = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 1.0), seed = 7L)
      .select("lang").distinct().as[String].collect().toSeq
    assert(onlyEn === Seq("en"))
  }

  test("rankedByRange: exact global ranks equal the single-partition window form, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => ((i * 37) % 101, i.toLong)).toDF("v", "id")
    val expect = df
      .withColumn("rn", row_number().over(Window.orderBy("v", "id")).cast("long"))
      .as[(Int, Long, Long)].collect().toSet
    val a = Sampling.rankedByRange(df.repartition(1), Seq("v", "id"), 7)
      .as[(Int, Long, Long)].collect().toSet
    val b = Sampling.rankedByRange(df.repartition(13), Seq("v", "id"), 5)
      .as[(Int, Long, Long)].collect().toSet
    assert(a === expect, "ranks must equal the global window form")
    assert(b === expect, "ranks must not depend on input partitioning")
    // more range partitions than rows: offsets over empty partitions
    val tiny = Seq((3, 1L), (1, 2L), (2, 3L)).toDF("v", "id")
    val t = Sampling.rankedByRange(tiny, Seq("v", "id"), 8)
      .as[(Int, Long, Long)].collect().toSet
    assert(t === Set((1, 2L, 1L), (2, 3L, 2L), (3, 1L, 3L)))
  }

  test("ntileByRange deals exactly like ntile, including the first-tiles-get-extra rule") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, ntile}
    // n × k grid chosen to cover: even dealing (10/5), uneven (7/5 —
    // where the naive ((rn−1)·k) div n + 1 formula deals [2,1,2,1,1]
    // instead of ntile's [2,2,1,1,1]), n < k (3/5: tile = rn), n = k,
    // and a larger uneven case (101/7); values shuffled across
    // partitions so the range exchange genuinely re-sorts.
    for ((n, k) <- Seq((10, 5), (7, 5), (3, 5), (5, 5), (101, 7))) {
      val rows = new scala.util.Random(n * 31 + k).shuffle(
        (1 to n).toVector).map(v => (v, s"id$v"))
      val df = spark.createDataFrame(rows).toDF("v", "id").repartition(6)
      val got = Sampling.ntileByRange(df, k, Seq("v", "id"), 4)
        .select(col("v"), col("stratum")).as[(Int, Int)].collect().toMap
      val want = df.withColumn("stratum",
          ntile(k).over(Window.orderBy("v", "id")))
        .select(col("v"), col("stratum")).as[(Int, Int)].collect().toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("prioritySample: k >= population means tau=0 and the estimate is exact") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "w0")
    val got = Sampling.prioritySample(df, Seq("id"), col("w0"), k = 10,
      seed = 5L)
    val rows = got.select("id", "tau", "w_hat").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(rows.forall(_._2 === 0.0))
    assert(rows.map(_._3).toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("prioritySample: tau is the (k+1)-th priority, w_hat >= w, partition-invariant") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, (i % 13 + 1).toDouble)).toDF("id", "w0")
    val got = Sampling.prioritySample(df, Seq("id"), col("w0"), k = 20,
      seed = 7L)
    val rows = got.select("id", "w", "priority", "tau", "w_hat")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.length === 20)
    val tau = rows.head._4
    assert(rows.forall(_._4 === tau))
    // tau separates the sample: every kept priority >= tau, and tau is
    // strictly below the smallest kept one unless tied
    assert(rows.forall(_._3 >= tau))
    assert(rows.forall(r => r._5 === math.max(r._2, tau)))
    // exclusion sanity: no row with w <= 0 could appear, and the same
    // call on a different partitioning returns the identical sample
    val re = Sampling.prioritySample(df.repartition(7), Seq("id"),
        col("w0"), k = 20, seed = 7L)
      .select("id", "w_hat").as[(Long, Double)].collect().toMap
    assert(re === rows.map(r => r._1 -> r._5).toMap)
  }

  test("prioritySample: a dominant weight rides the w-branch while light rows take tau") {
    import org.apache.spark.sql.functions.col
    // one heavy row (w=1000) among 100 light ones (w=1): tau ~ total/k
    // is far below 1000, so the heavy row's w_hat = w while every
    // light row's w_hat = tau — BOTH branches of greatest(w, tau) in
    // one output (the fixture-weight gate q332 can only exercise the
    // tau regime: total/k exceeds max w on every table, structurally)
    val df = ((1L to 100L).map(i => (i, 1.0)) :+ (999L, 1000.0))
      .toDF("id", "w0")
    val got = Sampling.prioritySample(df, Seq("id"), col("w0"), k = 10,
        seed = 2L)
      .select("id", "w", "tau", "w_hat")
      .as[(Long, Double, Double, Double)].collect()
    val tau = got.head._3
    assert(tau > 0 && tau < 1000.0)
    val heavy = got.find(_._1 === 999L)
    assert(heavy.nonEmpty, "the dominant row must be sampled")
    assert(heavy.get._4 === 1000.0)
    assert(got.filter(_._1 !== 999L).forall(r => r._4 === tau))
  }

  test("prioritySample: null/zero/negative weights are dropped, never sampled") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(0.0)),
      (4L, Some(-2.0)), (5L, Some(1.0))).toDF("id", "w0")
    val got = Sampling.prioritySample(df, Seq("id"), col("w0"), k = 3,
        seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 5L))
  }
}
