package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format coverage beyond parquet: JSON-lines and CSV
  * round-trips with DECLARED schemas (inference is a schema-drift trap
  * and a full extra pass over the data at 100 TB — SURVEY.md §1.3).
  * Parquet is exercised by every query; the ingest JSON-payload path
  * by PipelineSpec. */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "n_chars").orderBy("doc_id")

  test("json-lines sink + declared-schema source round-trips exactly") {
    val dir = Files.createTempDirectory("graft-json-").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.collect().toSet === docs.collect().toSet)
    assert(back.schema === schema)
  }

  test("orc sink + source round-trips exactly (columnar alternative to parquet)") {
    val dir = Files.createTempDirectory("graft-orc-").toString + "/docs"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().toSet === docs.collect().toSet)
    assert(back.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
    // pushdown parity with parquet: a literal predicate reaches the
    // ORC scan as a pushed filter (same PlanShapeSpec discipline)
    val q = spark.read.orc(dir).filter(col("doc_id") === 7L)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters: ["))
    assert(q.count() === 1)
  }

  test("csv sink + declared-schema source round-trips exactly (header on)") {
    val dir = Files.createTempDirectory("graft-csv-").toString + "/docs"
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.collect().toSet === docs.collect().toSet)
  }

  test("csv malformed rows surface in the corrupt-record column, not as task failures") {
    val dir = Files.createTempDirectory("graft-csv-bad-")
    Files.writeString(dir.resolve("part-0.csv"),
      "7,en,100\nnot-a-long,es,50\n9,fr,abc\n")
    val withCorrupt = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val read = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir.toString)
      .cache() // corrupt-record column requires a materialized referenced plan
    try {
      assert(read.count() === 3)
      assert(read.filter(col("_corrupt_record").isNotNull).count() === 2)
      assert(read.filter(col("_corrupt_record").isNull)
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(7L))
    } finally read.unpersist()
  }
}
