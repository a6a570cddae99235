package graft.functions

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** The extension seam (SURVEY.md §2B "UDF surface"): one scalar UDF,
  * one Aggregator-based UDAF, one flatMap table function — each proving
  * a different way user code plugs into the engine.
  *
  * NONE of these appear in the oracle query set or the bench path:
  * UDFs break whole-stage codegen and add serialization, so built-in
  * expressions are always preferred when they can express the
  * semantics (every q* query is UDF-free). These exist because a real
  * engine must let users express what built-ins can't — here SimHash,
  * whose per-bit vote accumulator has no built-in aggregate form.
  */
object Udfs {

  /** Scalar UDF: the reference's revenue measure (R9's
    * price × sold_quantity — mercadolibre_pipeline_dag.py:75). The
    * built-in equivalent is `col("price") * col("qty")`; the UDF form
    * exists to test the seam. */
  val revenue = udf((price: Double, qty: Long) => price * qty)

  /** 64-bit SimHash UDAF over pre-hashed token values (feed it
    * xxhash64(token)): classic bit-vote — each input hash votes +1/-1
    * per bit position, the sign of each vote becomes the output bit.
    * Near-identical token bags → small Hamming distance. Order- and
    * duplicate-insensitive enough for near-dup blocking; the buffer is
    * a fixed 64-int array, so state is O(1) per group at any scale. */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
      var b = 0
      while (b < 64) {
        buf(b) += (if (((tokenHash >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Long = {
      var out = 0L
      var b = 0
      while (b < 64) {
        if (buf(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The SimHash aggregate as a Column function:
    * df.groupBy("doc_id").agg(simhash(xxhash64(col("token")))). */
  def simhash(tokenHash: Column): Column = udaf(SimHashAgg).apply(tokenHash)

  /** Hamming distance between two simhash values (built-in expressions
    * — bit_count of xor; no UDF needed for the comparison side). */
  def hammingDist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))

  /** Table function via flatMap: one (id, shingle) row per word
    * n-gram — the Dataset-typed twin of Dedup.shingles+explode.
    * Demonstrates arbitrary one-to-many user logic with a typed
    * encoder (the seam mapPartitions-style operators use). */
  def explodeShingles(docs: Dataset[(Long, String)], n: Int): Dataset[(Long, String)] = {
    implicit val enc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.flatMap { case (id, text) =>
      text.split(" ").iterator.sliding(n).withPartial(false)
        .map(w => (id, w.mkString(" ")))
    }
  }
}
