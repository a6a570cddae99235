package graft

import graft.pipeline.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 ingest source: the reference's per-category fetch as
  * one InputPartition per category (its serial loop, parallelized).
  * The fetch body is a stub; partitioning, options, schema, and the
  * payload contract into Ingest.normalize are the real thing. */
class ApiSourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def read(cats: String, pages: Int = 1) =
    spark.read.format("graft-api")
      .option("categories", cats).option("pages", pages.toString).load()

  test("short name resolves; one row per (category, page); schema as declared") {
    val df = read("MLA1,MLA2,MLA3", pages = 2)
    assert(df.columns.toSeq === Seq("category", "page", "payload"))
    assert(df.count() === 6)
    assert(df.select("category").distinct().count() === 3)
  }

  test("parallelism contract: one input partition per category") {
    val df = read("a,b,c,d,e")
    assert(df.rdd.getNumPartitions === 5)
    // each partition carries exactly its own category
    val perPart = df.select("category").rdd
      .mapPartitions(it => Iterator(it.map(_.getString(0)).toSet.size))
      .collect()
    assert(perPart.toSeq === Seq.fill(5)(1))
  }

  test("payloads are deterministic and flow through Ingest.normalize end-to-end") {
    val a = read("MLA1,MLA2").orderBy("category", "page").collect()
    val b = read("MLA1,MLA2").orderBy("category", "page").collect()
    assert(a.toSeq === b.toSeq) // stub fetch is seeded — stable across runs

    val products = Ingest.normalize(read("MLA1,MLA2", pages = 2), "payload")
    assert(products.count() === 2 * 2 * 3) // cats × pages × items/page
    assert(products.filter(col("id").isNull || col("price").isNull).isEmpty)
    // R1-R7 end to end: source → normalize → snapshot load
    val out = java.nio.file.Files.createTempDirectory("graft-api-").toString + "/products"
    Ingest.run(read("MLA1,MLA2"), "payload", out)
    assert(spark.read.parquet(out).count() === 6)
  }

  test("missing categories option fails fast with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-api").load().collect()
    }
    assert(e.getMessage.contains("categories"))
  }
}
