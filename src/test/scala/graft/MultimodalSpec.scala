package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: the decoder itself is a documented STUB
  * (no media libs in the container), so what's under test is the real
  * contract — schema shape, binary round-trip, mapPartitions batching,
  * determinism, slice sampling. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).limit(50)

  test("assemble nests doc/meta/vec structs addressable by field path") {
    val out = Multimodal.assemble(
      Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))
    val row = out.select(
        col("doc_id"), col("doc.meta.lang"), col("vec.label"),
        size(col("vec.embedding")).as("dims"))
      .orderBy("doc_id").limit(1).collect()(0)
    assert(!row.isNullAt(1) && !row.isNullAt(2))
    assert(row.getInt(3) > 0)
    // join must be 1:1 on the fixture ids
    assert(out.count() === out.select("doc_id").distinct().count())
  }

  test("withBinaryPayload: payload decodes back to the text; metadata typed") {
    val bad = Multimodal.withBinaryPayload(docs)
      .select(col("doc_id"),
        decode(col("payload"), "UTF-8").as("roundtrip"),
        col("media_meta.mime"), col("media_meta.n_bytes"))
      .join(docs, "doc_id")
      .filter(col("roundtrip") =!= col("text") || col("mime") =!= "text/plain")
    assert(bad.isEmpty)
  }

  test("extractFeatures (stub decoder) is deterministic and reports true byte length") {
    val payloads = Multimodal.withBinaryPayload(docs)
    val a = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq) // stable across runs — stub contract
    val lens = docs.select(col("doc_id"), length(col("text")).cast("int").as("n"))
      .as[(Long, Int)].collect().toMap
    for (f <- a) {
      assert(f.n_bytes === lens(f.doc_id)) // fixture text is ASCII
      assert(f.width >= 64 && f.height >= 64)
    }
  }

  test("resizePayload (stub) keeps every stride-th byte, ceil-length output") {
    val df = Seq((1L, "abcdefghij"), (2L, "xyz")).toDF("doc_id", "text")
    val out = Multimodal.resizePayload(Multimodal.withBinaryPayload(df), 3)
      .collect().map { case (id, b) => id -> new String(b, "UTF-8") }.toMap
    assert(out === Map(1L -> "adgj", 2L -> "x"))
  }

  test("sampleSlices emits fixed-size prefix slices of the payload") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val slices = Multimodal.sampleSlices(
        Multimodal.withBinaryPayload(df), sliceBytes = 3, everyK = 1)
      .select(transform(col("slices"), s => decode(s, "UTF-8")).as("s"))
      .as[Seq[String]].head()
    assert(slices.nonEmpty)
    assert(slices.head === "abc") // first slice = first 3 bytes
    for (s <- slices) assert(s.length <= 3)
  }
}
