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

  test("filter pushdown PRUNES input partitions: a filtered-out category is never fetched") {
    import graft.sources.ApiPartitionReader
    // category = 'b' over 5 categories: 1 surviving partition, and the
    // fetch counter moves by exactly pages x 1 (local[4]: readers run
    // in this JVM, so the counter witnesses "the fetch never happened")
    val eq = read("a,b,c,d,e", pages = 2).filter(col("category") === "b")
    assert(eq.rdd.getNumPartitions === 1, "EqualTo must prune to one partition")
    ApiPartitionReader.fetchCount.set(0L)
    // materialize the payloads (count() alone would prune the column
    // and fetch NOTHING — pruning working as designed)
    val payloads = eq.select("payload").as[String].collect()
    assert(payloads.length === 2 && payloads.forall(_.nonEmpty))
    assert(ApiPartitionReader.fetchCount.get() === 2L,
      "filtered-out categories must not be fetched")
    // IN-list prunes to the intersection
    val in = read("a,b,c,d,e").filter(col("category").isin("b", "d", "zz"))
    assert(in.rdd.getNumPartitions === 2)
    assert(in.select("category").as[String].collect().toSet === Set("b", "d"))
    // non-category predicates stay RESIDUAL and still evaluate correctly
    val resid = read("a,b,c", pages = 3).filter(col("page") >= 1)
    assert(resid.rdd.getNumPartitions === 3, "page predicates are not pushed")
    assert(resid.count() === 6)
  }

  test("column pruning: a scan that never projects the payload never synthesizes it") {
    import graft.sources.ApiPartitionReader
    ApiPartitionReader.fetchCount.set(0L)
    val slim = read("a,b,c", pages = 4).select("category", "page")
    assert(slim.count() === 12)
    assert(slim.distinct().count() === 12)
    assert(ApiPartitionReader.fetchCount.get() === 0L,
      "payload must not be fetched when not projected")
    // projection order is honored even when it differs from the schema
    val flipped = read("a", pages = 2).select("page", "category")
      .as[(Int, String)].collect().toSet
    assert(flipped === Set((0, "a"), (1, "a")))
  }

  test("aggregate pushdown: count(*)/min/max answered from metadata, zero fetches") {
    import graft.sources.ApiPartitionReader
    // global count(*): one partial row per partition, merged by
    // Spark's final aggregate — and the fetch stub never runs (the
    // API analog of a COUNT endpoint / parquet footer stats)
    ApiPartitionReader.fetchCount.set(0L)
    val n = read("a,b,c", pages = 4).agg(count(lit(1))).as[Long].head()
    assert(n === 12L)
    // per-category counts ride the pushed groupBy(category)
    val byCat = read("a,b", pages = 3).groupBy("category").count()
      .as[(String, Long)].collect().toMap
    assert(byCat === Map("a" -> 3L, "b" -> 3L))
    // min/max page from the partition's own page range
    val mm = read("a,b", pages = 5)
      .agg(min("page"), max("page")).as[(Int, Int)].head()
    assert(mm === ((0, 4)))
    assert(ApiPartitionReader.fetchCount.get() === 0L,
      "pushed aggregates must never trigger a fetch")
    // the plan carries the pushed-aggregate marker (scan description)
    val p = read("a", pages = 2).groupBy("category").count()
      .queryExecution.executedPlan.toString
    assert(p.contains("pushedAggregates=[count_star]"),
      s"aggregate not pushed into the scan:\n$p")
    // pushdown composes with filter pruning: the filtered-out
    // category contributes neither fetches nor partials
    val filtered = read("a,b,c", pages = 2)
      .filter(col("category") === "b").agg(count(lit(1))).as[Long].head()
    assert(filtered === 2L)
    // pages=0 ⇒ pushdown DECLINED (r15, ADVICE): an all-empty scan
    // with a pushed no-group-by COUNT would merge zero partial rows
    // into NULL via Spark's COUNT-as-SUM rewrite. The decline routes
    // through row emission and count(*) reads the correct 0.
    val emptyDf = read("a,b", pages = 0).agg(count(lit(1)))
    assert(emptyDf.as[Long].head() === 0L,
      "count(*) over an empty source must be 0, not NULL")
    assert(!emptyDf.queryExecution.executedPlan.toString
        .contains("pushedAggregates"),
      "pages=0 must decline aggregate pushdown")
  }

  test("unsupported aggregates decline cleanly and fall back to row emission") {
    // SUM(page) is not pushable: the scan reverts to (pruned) rows
    // and Spark aggregates them — correctness must not depend on the
    // source understanding the aggregate
    val s = read("a,b", pages = 3).agg(sum("page")).as[Long].head()
    assert(s === 2L * (0 + 1 + 2))
    val p = read("a,b", pages = 3).agg(sum("page"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("pushedAggregates"),
      s"sum must not claim pushdown:\n$p")
    // avg over a grouped read, same story
    val a = read("a", pages = 4).groupBy("category")
      .agg(avg("page")).as[(String, Double)].head()
    assert(a === (("a", 1.5)))
  }

  test("limit and top-N pushdown stop fetching past the cap") {
    import graft.sources.ApiPartitionReader
    // plain LIMIT: each of the 2 partitions emits at most 3 rows —
    // fetches 6, not 10; Spark's re-applied global limit returns 3
    ApiPartitionReader.fetchCount.set(0L)
    val limited = read("a,b", pages = 5).limit(3).collect()
    assert(limited.length === 3)
    // ≤ 2 cats × 3: Spark's incremental limit execution may satisfy
    // the global limit from the FIRST partition alone (observed: 3)
    val f = ApiPartitionReader.fetchCount.get()
    assert(f >= 3L && f <= 6L,
      s"limit must cap per-partition fetches (got $f, want within [3, 6])")
    val lp = read("a,b", pages = 5).limit(3)
      .queryExecution.executedPlan.toString
    assert(lp.contains("pushedLimit=3"), lp)
    // top-N on page DESC: partitions walk the page range backwards,
    // fetch only the 2 newest pages each; global top-2 = the two
    // page-4 rows (one per category)
    ApiPartitionReader.fetchCount.set(0L)
    val top = read("a,b", pages = 5).orderBy(col("page").desc).limit(2)
      .collect()
    assert(top.map(_.getInt(1)).toSeq === Seq(4, 4))
    assert(ApiPartitionReader.fetchCount.get() === 4L,
      "top-N must fetch only the surviving tail (2 cats x 2)")
    val tp = read("a,b", pages = 5).orderBy(col("page").desc).limit(2)
      .queryExecution.executedPlan.toString
    assert(tp.contains("pushedLimit=2") && tp.contains("pageOrder=DESC"), tp)
    // top-N on a key the source has no order for: decline cleanly,
    // results still correct via Spark's own sort
    val byCat = read("a,b", pages = 2).orderBy("category", "page").limit(3)
    assert(!byCat.queryExecution.executedPlan.toString.contains("pushedLimit"))
    assert(byCat.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 0), ("a", 1), ("b", 0)))
    // limit larger than the page range: everything returns, no dupes
    assert(read("a", pages = 2).limit(99).collect().length === 2)
  }

  test("runtime v2 filtering: join-observed categories prune fetches at run time") {
    import graft.sources.ApiPartitionReader
    // 8 categories on the probe side, a filtered dim keeping only
    // {b, d} on the build side: Spark plans a dynamicpruning IN
    // subquery against the scan (SupportsRuntimeV2Filtering), the
    // scan's filter() drops the six doomed categories BEFORE
    // planInputPartitions, and the fetch counter proves the doomed
    // fetches never happened — DPP for a network source. The dim
    // carries a genuine selective filter (a bare 2-row literal frame
    // fails the DPP selectivity heuristic — found while building the
    // test).
    val api = spark.read.format("graft-api")
      .option("categories", "a,b,c,d,e,f,g,h").option("pages", "2").load()
    val dim = spark.range(0, 100).select(
        concat(lit("cat"), col("id")).as("category"), col("id").as("w"))
      .unionByName(Seq(("b", 1L), ("d", 2L)).toDF("category", "w"))
      .filter(col("w") <= 2)
    val joined = api.join(dim.hint("broadcast"), Seq("category"))
      .select("category", "page", "payload")
    // the plan must actually carry the runtime filter — otherwise the
    // fetch assertion below would pass vacuously slower (all fetched,
    // rows still correct) on a planner regression
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruningexpression"),
      s"runtime filter not planned:\n$plan")
    ApiPartitionReader.fetchCount.set(0L)
    val rows = joined.collect()
    assert(rows.length === 4) // {b, d} x 2 pages
    assert(rows.map(_.getString(0)).toSet === Set("b", "d"))
    assert(ApiPartitionReader.fetchCount.get() === 4L,
      "six doomed categories must never be fetched (2 cats x 2 pages only)")
    // static pushdown composes: a static filter narrows the runtime set
    ApiPartitionReader.fetchCount.set(0L)
    val both = api.filter(col("category").isin("a", "d", "e"))
      .join(dim.hint("broadcast"), Seq("category"))
      .select("category", "page", "payload").collect()
    assert(both.map(_.getString(0)).toSet === Set("d"))
    assert(ApiPartitionReader.fetchCount.get() === 2L)
  }
}
