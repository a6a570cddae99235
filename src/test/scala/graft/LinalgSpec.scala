package graft

import graft.ops.Linalg
import org.scalatest.funsuite.AnyFunSuite

class LinalgSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Sequential reference: the same quantize → Gram → max-norm power
    * iteration, in plain Scala loops (shares no code with the
    * DataFrame side). */
  private def refTop(vecs: Seq[(Long, Seq[Float])], iters: Int)
      : Map[Long, (Long, Long)] = {
    val xi = vecs.map { case (_, v) =>
      v.map(x => math.round(x.toDouble * 1000)).toArray }
    val d = xi.head.length
    val m = Array.ofDim[Long](d, d)
    for (row <- xi; i <- 0 until d; j <- 0 until d)
      m(i)(j) += row(i) * row(j)
    var v = Array.fill(d)(1000L)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * v(j)).sum)
      val mx = u.map(math.abs).max
      v = u.map(x => math.round(x.toDouble / mx * 1000))
    }
    (0 until d).map(i => i.toLong -> (v(i), m(i)(i))).toMap
  }

  private def run(vecs: Seq[(Long, Seq[Float])], iters: Int) =
    Linalg.topComponent(vecs.toDF("id", "vec"), "id", "vec", iters)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("topComponent: a corpus stretched along one axis loads ±1000 on it") {
    // points along the x-axis with tiny y jitter: the top component
    // must be (±1000, ~0); the second moment diagonal must dominate
    // in x.
    val vecs = (1L to 40L).map(i =>
      i -> Seq((if (i % 2 == 0) 1.0f else -1.0f) * (0.3f + (i % 5) * 0.1f),
        0.01f * (i % 3)))
    val got = run(vecs, 3)
    assert(got === refTop(vecs, 3))
    val (loadX, m00) = got(0L)
    val (loadY, m11) = got(1L)
    assert(math.abs(loadX) === 1000L, s"x loading $loadX")
    assert(math.abs(loadY) < 100L, s"y loading $loadY")
    assert(m00 > 100L * m11, s"diag $m00 vs $m11")
  }

  test("topComponent: a correlated 2D cloud points along the diagonal") {
    // y ≈ x ⇒ dominant direction ≈ (1,1)/√2: both loadings same sign
    // and within ~15% of each other
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map { i =>
      val x = (rnd.nextDouble() - 0.5).toFloat
      i -> Seq(x, x + 0.05f * (rnd.nextDouble() - 0.5).toFloat)
    }
    val got = run(vecs, 3)
    assert(got === refTop(vecs, 3))
    val (lx, _) = got(0L); val (ly, _) = got(1L)
    assert(lx.sign == ly.sign && math.abs(lx - ly) < 160,
      s"loadings $lx, $ly not diagonal")
  }

  test("topComponent is partition-invariant and iteration count matters until convergence") {
    val rnd = new scala.util.Random(19)
    val vecs = (1L to 50L).map(i =>
      i -> Seq.fill(6)((rnd.nextDouble() - 0.5).toFloat))
    val base = run(vecs, 3)
    assert(base === refTop(vecs, 3))
    val rep = Linalg.topComponent(
        vecs.toDF("id", "vec").repartition(7), "id", "vec", 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rep === base)
    // 1-iteration result differs from 3 (the iterate actually moves)
    assert(run(vecs, 1) !== base)
  }

  test("topComponent fails loudly on an all-zero corpus (mx = 0 guard)") {
    // ADVICE r16: without the guard the rescale divides by zero and
    // silently emits null/NaN loadings.
    val zeros = (1L to 5L).map(i => i -> Seq(0.0f, 0.0f, 0.0f))
    val e = intercept[Exception] {
      Linalg.topComponent(zeros.toDF("id", "vec"), "id", "vec", 2)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("max|u| = 0")), s"wrong error: $e")
  }
}
