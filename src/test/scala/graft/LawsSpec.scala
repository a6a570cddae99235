package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic-law property tests (SURVEY.md §5.2 #3) on ScalaCheck
  * generators. The scalatest↔scalacheck bridge artifact isn't in the
  * offline cache, so sampling is explicit and SEEDED (deterministic
  * across runs — no flaky statistical tails): each law is checked over
  * a fixed fan of generated row sets, Spark evaluates the law itself. */
class LawsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val text = Gen.chooseNum(1, 10)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L), text))

  test("law: filter commutes with projection-preserving derive") {
    for (data <- samples(rows, 8)) {
      val df = data.toDF("id", "text")
      val p = col("id") % 2 === 0
      val a = df.filter(p).withColumn("n", length(col("text")))
      val b = df.withColumn("n", length(col("text"))).filter(p)
      assert(a.collect().toSet === b.collect().toSet, s"data=$data")
    }
  }

  test("law: unionByName row-count additivity") {
    for (Seq(d1, d2) <- samples(rows, 8).grouped(2).toSeq if d1 != null) {
      val a = d1.toDF("id", "text")
      val b = d2.toDF("id", "text")
      assert(a.unionByName(b).count() === a.count() + b.count())
    }
  }

  test("law: exactDedup is idempotent and keeps one row per distinct text") {
    for (data <- samples(rows, 8)) {
      val df = data.zipWithIndex
        .map { case ((_, t), i) => (i.toLong, t) }.toDF("id", "text")
      val once = Dedup.exactDedup(df, "text", "id")
      val twice = Dedup.exactDedup(once, "text", "id")
      assert(once.count() === df.select("text").distinct().count(), s"data=$data")
      assert(twice.collect().toSet === once.collect().toSet, s"data=$data")
    }
  }

  test("law: window running sum over an unbounded frame ends at the group sum") {
    import org.apache.spark.sql.expressions.Window
    for (data <- samples(rows, 6) if data.nonEmpty) {
      val df = data.zipWithIndex
        .map { case ((id, t), i) => (id % 3, i.toLong, t.length.toLong) }
        .toDF("g", "seq", "v")
      val w = Window.partitionBy("g").orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bad = df.withColumn("run", sum("v").over(w))
        .groupBy("g").agg(max("run").as("final_run"), sum("v").as("total"))
        .filter(col("final_run") =!= col("total"))
      assert(bad.isEmpty, s"data=$data")
    }
  }

  test("law: minhash est-Jaccard of a text with itself is exactly 1") {
    for (t <- samples(text, 8)) {
      val j = Seq(t).toDF("text")
        .select(Dedup.minhashSignature(
          Dedup.shingles(split(col("text"), " "), 1), 32).as("sig"))
        .select(Dedup.estJaccard(col("sig"), col("sig"), 32).as("j"))
        .as[Double].head()
      assert(j === 1.0, s"text=$t")
    }
  }

  test("law: qualityScore ∈ [0,1] and fingerprint is token-order invariant") {
    val rnd = new scala.util.Random(7)
    for (t <- samples(text, 8)) {
      val shuffled = rnd.shuffle(t.split(" ").toList).mkString(" ")
      val got = Seq((t, shuffled)).toDF("a", "b").select(
        TextAnalysis.qualityScore(col("a")).as("q"),
        TextAnalysis.bagFingerprint(col("a")).as("fa"),
        TextAnalysis.bagFingerprint(col("b")).as("fb"))
        .as[(Double, String, String)].head()
      assert(got._1 >= 0.0 && got._1 <= 1.0, s"text=$t")
      assert(got._2 === got._3, s"text=$t shuffled=$shuffled")
    }
  }

  test("law: LSH candidate pairs ⊇ exact-duplicate pairs") {
    val corpus = Gen.listOfN(6, text).map { ts =>
      val base = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      base :+ (100L, base.head._2) // force one exact duplicate pair
    }
    for (data <- samples(corpus, 6)) {
      val df = data.toDF("doc_id", "text")
      val cands = Dedup.lshCandidatePairs(df, "doc_id", "text",
        shingleN = 1, numHashes = 16, bands = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val exactDups = data.combinations(2).collect {
        case Seq((i, ta), (j, tb)) if ta == tb =>
          (math.min(i, j), math.max(i, j))
      }.toSet
      assert(exactDups.subsetOf(cands), s"missing ${exactDups -- cands} in data=$data")
    }
  }
}
