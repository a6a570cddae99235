package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the 4× memory/IO reduction
  * a 100 TB embedding store runs on (a float32 corpus that doesn't fit
  * executor memory often does as int8, and ANN candidate scoring over
  * int8 + a per-vector scale loses <0.5 LSB of precision per element).
  *
  * Per-vector scheme (the one ONNX/FAISS-style scalar quantization
  * uses): scale = max(|x_i|)/127, q_i = round(x_i/scale) ∈ [-127,127],
  * dequant x̂_i = q_i·scale, so |x − x̂| ≤ scale/2 element-wise.
  *
  * All row-local array transforms — zero shuffle, fully codegen'd.
  * Arithmetic is pinned to DOUBLE (float→double widening is exact, and
  * both engines' round() is half-away-from-zero on double) so the
  * DuckDB oracle reproduces the quantized vector bit-for-bit.
  *
  * The zero vector (scale = 0) quantizes to all zeros — guarded
  * explicitly: round(x/0.0) would be round(±Inf/NaN) and overflow the
  * int cast.
  */
object Quantize {

  /** Per-vector quantization step: max(|x_i|)/127 in double. */
  def int8Scale(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double")))) / lit(127.0)

  /** round(x_i/scale) as int (range [-127, 127] by construction of
    * `int8Scale`; int not byte — Spark/DuckDB md5+join checksums agree
    * on int rendering, and a TINYINT column would add nothing at rest
    * once parquet dictionary-encodes the 255 values). */
  def quantizeInt8(emb: Column, scale: Column): Column =
    when(scale === 0.0, transform(emb, _ => lit(0)))
      .otherwise(transform(emb, x => round(x.cast("double") / scale).cast("int")))

  /** Dequantized (double) vector: q_i·scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Element-wise max absolute reconstruction error |x_i − q_i·scale|
    * — ≤ scale/2 by construction; the property QuantizeSpec pins. */
  def maxAbsError(emb: Column, q: Column, scale: Column): Column =
    array_max(zip_with(emb, q,
      (x, v) => abs(x.cast("double") - v.cast("double") * scale)))
}
