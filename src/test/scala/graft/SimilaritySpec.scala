package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search tests: exact vector math on known values, top-k
  * ordering, and the IVF cell-probe path (the 100 TB layout: partition
  * by cell, probe a subset). */
class SimilaritySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("dot / normSq / cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f)))
      .toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("dot"),
        Similarity.normSq(col("a")).as("n2"),
        Similarity.cosine(col("a"), col("a")).as("cos_self"))
    val (dot, n2, cosSelf) = df.as[(Double, Double, Double)].head()
    assert(dot === 1.0 * 4 - 2 * 5 + 3 * 6) // 12.0
    assert(n2 === 14.0)
    assert(math.abs(cosSelf - 1.0) < 1e-12)
  }

  test("topKDot returns exactly k best by dot product, ties broken by id") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(-1.0f, 0.0f)),
      (5L, Seq(1.0f, 0.0f))) // tie with id 1
      .toDF("vec_id", "embedding")
    val query = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("q")
    val got = Similarity.topKDot(corpus, "vec_id", "embedding", query, "q", 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 5L, 3L)) // 1.0, 1.0, 0.5
    assert(got.map(_._2).toSeq === Seq(1.0, 1.0, 0.5))
  }

  test("assignCells puts each vector in its nearest centroid's cell") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cell_id", "c_vec")
    val cells = Similarity.assignCells(corpus, "vec_id", "embedding", centroids)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(cells === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("ivfTopK with full probe equals brute force; partial probe stays within probed cells") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cell_id", "c_vec")
    val indexed = Similarity.assignCells(corpus, "vec_id", "embedding", centroids)
    val query = Seq(Tuple1(Seq(1.0f, 0.2f))).toDF("q")

    val brute = Similarity.topKDot(corpus, "vec_id", "embedding", query, "q", 2)
      .as[(Long, Double)].collect().toSeq
    val full = Similarity.ivfTopK(indexed, "vec_id", "embedding",
      centroids, query, "q", 2, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(full === brute)

    val oneProbe = Similarity.ivfTopK(indexed, "vec_id", "embedding",
      centroids, query, "q", 2, nProbe = 1).as[(Long, Double)].collect().toSeq
    // query leans to cell 0 → results come only from {1, 2}
    assert(oneProbe.map(_._1).toSet.subsetOf(Set(1L, 2L)))
  }

  test("cosineSketch: identical vectors sketch identically; Hamming tracks cosine") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding"),
        Similarity.cosineSketch(col("embedding"), dims = 64, bits = 32).as("sk"))
    // determinism + self-identity: recomputing yields the same sketch
    val twice = e.withColumn("sk2",
      Similarity.cosineSketch(col("embedding"), dims = 64, bits = 32))
      .filter(col("sk") =!= col("sk2"))
    assert(twice.isEmpty)

    // random-hyperplane property: P[bit differs] = angle/π, so the
    // Hamming distance of high-cosine pairs must undercut the mean of
    // near-orthogonal pairs on average.
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"), col("sk").as("ska"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"), col("sk").as("skb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(
        Similarity.cosine(col("va"), col("vb")).as("cos"),
        bit_count(col("ska").bitwiseXOR(col("skb"))).cast("double").as("ham"))
    val Array(hiHam, loHam) = pairs
      .select(
        avg(when(col("cos") > 0.2, col("ham"))),
        avg(when(abs(col("cos")) < 0.05, col("ham"))))
      .as[(Double, Double)].collect().map(t => Array(t._1, t._2)).head
    assert(hiHam < loHam, s"high-cos pairs hamming $hiHam !< near-orthogonal $loHam")
  }

  test("IVF corpus laid out by cell_id partition-prunes the partial probe scan") {
    // The 100 TB claim behind ivfTopK: with the corpus written
    // partitionBy(cell_id), a partial probe reads ONLY the probed
    // cells' directories. Asserted on the executed plan, not prose:
    // the cell_id membership predicate must appear as a
    // PartitionFilters entry of the parquet scan.
    val corpus = Tables.embeddings(spark, sfDir)
    val centroids = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_vec"))
    val indexed = graft.ops.Similarity.assignCells(
      corpus.filter(col("vec_id") =!= 0), "vec_id", "embedding", centroids)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    graft.pipeline.Warehouse.writePartitioned(indexed, dir, "cell_id")

    val onDisk = spark.read.parquet(dir)
    val query = corpus.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    val probe = graft.ops.Similarity.ivfTopK(onDisk, "vec_id", "embedding",
      centroids, query, "q_embedding", k = 5, nProbe = 2)
    probe.collect() // materialize so AQE finalizes the executed plan
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(plan).isDefined,
      s"cell_id probe did not become a partition filter:\n$plan")
    assert(probe.count() === 5)
  }

  test("updateCentroids: element-wise member means, positions ordered, dims preserved") {
    val indexed = Seq(
      (1L, Seq(1.0f, 2.0f), 0L), (2L, Seq(3.0f, 4.0f), 0L),
      (3L, Seq(10.0f, 20.0f), 1L))
      .toDF("vec_id", "embedding", "cell_id")
    val got = Similarity.updateCentroids(indexed, "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got === Map(0L -> Seq(2.0f, 3.0f), 1L -> Seq(10.0f, 20.0f)))
    // type-stable: refined centroids are array<float>, so a second
    // assignCells round still hits the float-array native-dot path
    val refined = Similarity.updateCentroids(indexed, "embedding")
      .select(col("cell_id"), col("c_vec"))
    assert(refined.schema("c_vec").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    val round2 = Similarity.assignCells(
      indexed.select("vec_id", "embedding"), "vec_id", "embedding", refined)
    assert(round2.count() === 3)
  }

  test("cosineNearDupPairs: planted near-dups all recalled, precision exact") {
    // 60 random base vectors + 20 planted near-duplicates (base + small
    // noise, cosine ≈ 0.999). Deterministic seeds throughout. At q73's
    // parameters (16 bands × 8 bits) banding recall at this cosine is
    // ≈ 1 − (1 − p_bit^8)^16 with p_bit = 1 − acos(cos)/π ≈ 0.994, i.e.
    // indistinguishable from 1 — so EVERY brute-force pair at the
    // threshold must come back, and (exact rescoring) nothing else.
    val dims = 32
    val rnd = new scala.util.Random(7)
    def randVec() = Array.fill(dims)(rnd.nextGaussian().toFloat)
    val base = (0L until 60L).map(i => (i, randVec()))
    val planted = (0L until 20L).map { i =>
      (100L + i, base(i.toInt)._2.map(x => x + (rnd.nextGaussian() * 0.02).toFloat))
    }
    val df = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val threshold = 0.9

    val a = df.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val truth = a.join(b, col("ia") < col("ib"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= threshold)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(truth.size >= 20, s"fixture bug: only ${truth.size} true pairs planted")

    val got = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dims, bands = 16, bitsPerBand = 8, threshold = threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(got),
      s"recall miss: ${(truth -- got).take(5)} not returned")
    assert(got.subsetOf(truth),
      s"precision miss: ${(got -- truth).take(5)} below threshold")
  }

  test("quantizedTopK with a 4×k shortlist recovers the exact top-k on fixtures") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val exact = Similarity.topKDot(corpus, "vec_id", "embedding", q, "qv", 10)
      .select("vec_id").as[Long].collect().toSet
    val quant = Similarity.quantizedTopK(corpus, "vec_id", "embedding", q, "qv",
        k = 10, shortlist = 40)
      .select("vec_id").as[Long].collect().toSet
    assert(quant === exact,
      s"quantized shortlist lost exact winners: missing ${exact -- quant}")
  }

  test("q51 on fixtures: top-1 by dot is the global argmax (brute-force check)") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val top = Similarity.topKDot(e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, "q", 1)
      .as[(Long, Double)].head()
    val all = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(Similarity.dot(col("embedding"), col("q")).as("s"))
      .agg(max("s")).as[Double].head()
    assert(math.abs(top._2 - all) < 1e-9)
  }

  test("semanticDedupKeep: drops lower-id near-dups within a cell, keeps across cells") {
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cell_id", "c_vec")
    val corpus = Seq(
      (1L, Seq(1.0f, 0.01f)),   // cell 0, survives (lowest id in cell)
      (2L, Seq(1.0f, 0.02f)),   // cell 0, cos ≈ 1 vs id 1 → dropped
      (3L, Seq(0.01f, 1.0f)),   // cell 1, survives
      (4L, Seq(0.02f, 1.0f)),   // cell 1, cos ≈ 1 vs id 3 → dropped
      (5L, Seq(0.8f, -0.6f)))   // cell 0, cos vs id 1 ≈ 0.79 < τ → survives
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedupKeep(corpus, "vec_id", "embedding",
        centroids, threshold = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(kept.keySet === Set(1L, 3L, 5L))
    assert(kept(1L) === 0L && kept(3L) === 1L && kept(5L) === 0L)
  }

  test("semanticDedupKeep is blind across cell boundaries (the SemDeDup trade)") {
    // near-identical vectors straddling the diagonal assign to
    // DIFFERENT cells and are never compared — both survive. This is
    // the documented recall trade the cluster bound buys.
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cell_id", "c_vec")
    val corpus = Seq(
      (1L, Seq(0.71f, 0.70f)),  // cell 0
      (2L, Seq(0.70f, 0.71f)))  // cell 1; cos(1,2) ≈ 0.9999 but cross-cell
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedupKeep(corpus, "vec_id", "embedding",
        centroids, threshold = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(kept === Map(1L -> 0L, 2L -> 1L))
  }

  test("semanticDedupKeep greedy drop: b drops on a lower-id neighbor even if that neighbor also drops") {
    // chain 1~2, 2~3 with 1≁3 inside one cell: greedy drops BOTH 2 and
    // 3 (each has a lower-id neighbor ≥ τ) — kept = {1}, matching
    // Dedup.nearDedupFromPairs chain semantics.
    val centroids = Seq((0L, Seq(1.0f, 0.0f))).toDF("cell_id", "c_vec")
    val a = math.toRadians(0.0); val b = math.toRadians(16.0); val c = math.toRadians(32.0)
    def v(t: Double) = Seq(math.cos(t).toFloat, math.sin(t).toFloat)
    val corpus = Seq((1L, v(a)), (2L, v(b)), (3L, v(c)))
      .toDF("vec_id", "embedding")
    // cos(16°) ≈ 0.961 ≥ 0.95; cos(32°) ≈ 0.848 < 0.95
    val kept = Similarity.semanticDedupKeep(corpus, "vec_id", "embedding",
        centroids, threshold = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(kept.keySet === Set(1L))
  }

  test("pqTrain: m codebooks of sub-dim codewords; pqEncode: one code per (vector, subspace)") {
    val e = Tables.embeddings(spark, sfDir)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_vec"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val cb = Similarity.pqTrain(corpus, "vec_id", "embedding", seeds,
      m = 4, dims = 64, iters = 1)
    val shapes = cb.select(col("sub"), size(col("c_vec")).as("d"))
      .distinct().as[(Int, Int)].collect().toSet
    assert(shapes.map(_._1) === Set(0, 1, 2, 3))
    assert(shapes.forall(_._2 === 16), s"sub-dim wrong: $shapes")
    // ≤ 8 codewords per subspace (empty cells may drop)
    val perSub = cb.groupBy("sub").count().as[(Int, Long)].collect().toMap
    assert(perSub.values.forall(n => n >= 1 && n <= 8))
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, m = 4, dims = 64)
    val n = corpus.count()
    assert(codes.count() === n * 4, "one code per (vector, subspace)")
    assert(codes.groupBy("vec_id", "sub").count()
      .filter(col("count") > 1).isEmpty, "codes must be unique per (id, sub)")
  }

  test("pqTopK with a full-corpus shortlist is EXACTLY brute-force top-k; a 40-shortlist recalls most of it") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_vec"))
    val cb = Similarity.pqTrain(corpus, "vec_id", "embedding", seeds,
      m = 4, dims = 64, iters = 2)
    val truth = Similarity.topKDot(corpus, "vec_id", "embedding", q, "q_embedding", 10)
      .select("vec_id").as[Long].collect().toSet
    // shortlist = whole corpus ⇒ the rescore IS brute force
    val full = Similarity.pqTopK(corpus, "vec_id", "embedding", cb,
        q, "q_embedding", m = 4, dims = 64, k = 10, shortlist = corpus.count().toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(full === truth)
    // the production shortlist: a 32-bit code (4×8) on near-isotropic
    // synthetic embeddings is the WORST case for PQ (no cluster
    // structure to exploit — observed recall ≈ 0.4 at sf0.001), so the
    // pins are a floor well above chance (random 40 of 499 would recall
    // ~0.08) plus the property that matters: widening the shortlist
    // monotonically recovers the exact answer.
    def recallAt(shortlist: Int): Double = {
      val ann = Similarity.pqTopK(corpus, "vec_id", "embedding", cb,
          q, "q_embedding", m = 4, dims = 64, k = 10, shortlist = shortlist)
        .select("vec_id").as[Long].collect().toSet
      (ann intersect truth).size / 10.0
    }
    val r40 = recallAt(40)
    val r120 = recallAt(120)
    assert(r40 >= 0.3, s"recall@10 through the 40-shortlist = $r40")
    assert(r120 >= r40, s"recall must not degrade with a wider shortlist: $r40 -> $r120")
    assert(r120 >= 0.5, s"recall@10 through the 120-shortlist = $r120")
  }

  test("ivfPqTopK with full probe + full shortlist is exactly brute force; the production probe recalls a floor") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_vec"))
    val truth = Similarity.topKDot(corpus, "vec_id", "embedding", q, "q_embedding", 10)
      .select("vec_id").as[Long].collect().toSet
    // nProbe = all cells AND shortlist = whole corpus: the ADC phase
    // only orders candidates - the exact rescore must reproduce brute
    val full = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", coarse,
        8L, 16L, q, "q_embedding", m = 4, dims = 64, iters = 1,
        nProbe = 8, k = 10, shortlist = corpus.count().toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(full === truth)
    // the production shape (4 of 8 cells, 40-shortlist): cell pruning
    // bounds recall by the probe (a true neighbor in an unprobed cell
    // is unreachable) - floor above chance, as with q293's PQ
    val ann = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", coarse,
        8L, 16L, q, "q_embedding", m = 4, dims = 64, iters = 1,
        nProbe = 4, k = 10, shortlist = 40)
      .select("vec_id").as[Long].collect().toSet
    val recall = (ann intersect truth).size / 10.0
    assert(recall >= 0.3, s"ivf-pq recall@10 = $recall")
  }

  test("hardNegatives: cell-bounded candidates, threshold excises the positive band, rank ties break on neg_id") {
    val cents = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(-1.0f, 0.0f)))
      .toDF("cell_id", "c_vec")
    val vecs = Seq(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0.8f, 0.0f), 7L -> Seq(0.8f, 0.0f), // 3/7: exact tie
      4L -> Seq(0.0f, 1.0f), 5L -> Seq(0.1f, 0.9f),
      6L -> Seq(0.0f, 0.8f), 8L -> Seq(0.0f, 0.95f),
      9L -> Seq(-1.0f, 0.0f), 10L -> Seq(-0.99f, 0.0f))
      .toDF("vec_id", "embedding")
    val indexed = Similarity.assignCells(vecs, "vec_id", "embedding",
      cents)
    val got = Similarity.hardNegatives(indexed, "vec_id", "embedding",
        k = 2, posThreshold = 0.85)
      .as[(Long, Long, Int, Double)].collect().toSet
    val exp = Set(
      // cell 0: the 1↔2 pair (0.9) is positive-band -> excluded;
      // anchor 1's two 0.8 candidates tie -> neg_id order (3 then 7)
      (1L, 3L, 1, 0.8), (1L, 7L, 2, 0.8),
      (2L, 3L, 1, 0.72), (2L, 7L, 2, 0.72),
      (3L, 1L, 1, 0.8), (3L, 2L, 2, 0.72),
      (7L, 1L, 1, 0.8), (7L, 2L, 2, 0.72),
      // cell 1: 4↔5 (0.9), 4↔8 (0.95), 5↔8 (0.855) all excluded
      (4L, 6L, 1, 0.8),
      (5L, 6L, 1, 0.72),
      (6L, 4L, 1, 0.8), (6L, 8L, 2, 0.76),
      (8L, 6L, 1, 0.76))
    assert(got === exp)
    // cell 2 holds only a near-dup pair (0.99): no row may label a
    // near-duplicate as a negative
    assert(!got.exists(r => r._1 == 9L || r._1 == 10L))
  }
}
