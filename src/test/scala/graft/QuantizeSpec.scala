package graft

import graft.ops.Quantize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def quantized(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("id", "emb")
      .select(col("id"), col("emb"), Quantize.int8Scale(col("emb")).as("scale"))
      .select(col("id"), col("scale"),
        Quantize.quantizeInt8(col("emb"), col("scale")).as("q"),
        Quantize.maxAbsError(col("emb"),
          Quantize.quantizeInt8(col("emb"), col("scale")), col("scale")).as("err"))
      .as[(Long, Double, Seq[Int], Double)].collect()

  test("int8 range, scale/2 error bound, and extremum mapping to ±127") {
    val rows = quantized(Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Seq(1e-6f, -3e-6f, 2e-6f, 0f))))
    for ((_, scale, q, err) <- rows) {
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(err <= scale / 2 + 1e-15)
      assert(q.exists(v => math.abs(v) == 127), "the max-|x| element must hit ±127")
    }
    // exact check on the hand vector: scale = 1/127, q = round(x*127)
    val q1 = rows.find(_._1 == 1L).get._3
    assert(q1 === Seq(64, -127, 32, 16))
  }

  test("zero vector quantizes to zeros with zero error (no div-by-zero overflow)") {
    val Array((_, scale, q, err)) = quantized(Seq((1L, Seq(0f, 0f, 0f))))
    assert(scale === 0.0 && q === Seq(0, 0, 0) && err === 0.0)
  }

  test("dequantize inverts to within the error bound") {
    val got = Seq((1L, Seq(0.7f, -0.2f, 0.05f))).toDF("id", "emb")
      .select(col("emb"), Quantize.int8Scale(col("emb")).as("scale"))
      .select(col("emb"), col("scale"),
        Quantize.dequantize(
          Quantize.quantizeInt8(col("emb"), col("scale")), col("scale")).as("deq"))
      .as[(Seq[Float], Double, Seq[Double])].head()
    val (emb, scale, deq) = got
    emb.zip(deq).foreach { case (x, xh) =>
      assert(math.abs(x.toDouble - xh) <= scale / 2 + 1e-15)
    }
  }
}
