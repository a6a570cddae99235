package graft

import graft.pipeline.{Ingest, Report}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Golden end-to-end tests for the reference pipeline (SURVEY.md §5.2
  * #5): ingest R1-R7 on literal payloads, report R11-R15 including the
  * reference's inverted-predicate forced-empty validation
  * (reference README.md:59-61 — empty result ⇒ NO artifact at all). */
class PipelineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def tmpDir(): Path = Files.createTempDirectory("graft-test-")

  private val payloads = Seq(
    // category 1: two products
    """{"results":[
      |{"id":"MLA1","site_id":"MLA","title":"Widget","price":100.5,"sold_quantity":80000,"thumbnail":"http://t/1"},
      |{"id":"MLA2","site_id":"MLA","title":"Gadget","price":5.0,"sold_quantity":3,"thumbnail":"http://t/2"}]}""".stripMargin,
    // category 2: empty results array (reference: empty category)
    """{"results":[]}""",
    // corrupt payload → from_json null → contributes no rows
    """not json at all""",
  ).toDF("payload")

  test("ingest normalize: R3 decode + R4 flatten + R5 project + R6 timestamp") {
    val out = Ingest.normalize(payloads, "payload")
    assert(out.columns.toSeq === Seq("id", "site_id", "title", "price",
      "sold_quantity", "thumbnail", "created_date"))
    val rows = out.select("id", "price", "sold_quantity")
      .as[(String, Double, Long)].collect().sortBy(_._1)
    assert(rows === Seq(("MLA1", 100.5, 80000L), ("MLA2", 5.0, 3L)))
    assert(out.filter(col("created_date").isNull).isEmpty)
  }

  test("ingest quarantine captures exactly the unparseable payloads") {
    val bad = Ingest.quarantine(payloads, "payload")
    assert(bad.count() === 1)
    assert(bad.select("raw_payload").as[String].head() === "not json at all")
    // good + quarantined partition the non-null inputs: 2 parseable
    // payloads (one of them empty-results) + 1 quarantined = 3 rows in
    assert(Ingest.normalize(payloads, "payload").count() === 2)
  }

  test("ingest snapshot load is an idempotent overwrite (R7 if_exists=replace)") {
    val dir = tmpDir().resolve("products").toString
    Ingest.run(payloads, "payload", dir)
    Ingest.run(payloads, "payload", dir) // second run replaces, not appends
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("report: threshold filter + render + sink writes one HTML artifact") {
    val dir = tmpDir()
    val products = Ingest.normalize(payloads, "payload")
    val hv = Report.highVolumeSales(products, 7000000.0) // reference's ARS$7M
    val out = dir.resolve("report.html")
    assert(Report.writeReport(hv, "high volume sales", out.toString))
    val html = Files.readString(out)
    assert(html.contains("<h1>high volume sales</h1>"))
    assert(html.contains("<td>MLA1</td>")) // 100.5 × 80000 = 8.04M ≥ 7M
    assert(!html.contains("MLA2"))        // 15 < 7M — filtered out
    // R10: created_date rendered dd-MM-yyyy
    assert("<td>\\d{2}-\\d{2}-\\d{4}</td>".r.findFirstIn(html).isDefined)
  }

  test("report escapes hostile cell content; large results truncate with a marker") {
    val dir = tmpDir()
    val hostile = Seq(
      ("</table><script>alert(1)</script>", 1L),
      ("a & b < c \"quoted\"", 2L))
      .toDF("title", "n")
    val out = dir.resolve("hostile.html")
    assert(Report.writeReport(hostile, "x<y & \"z\"", out.toString))
    val html = Files.readString(out)
    assert(!html.contains("<script>"), "markup injected through a cell")
    assert(html.contains("&lt;/table&gt;&lt;script&gt;alert(1)&lt;/script&gt;"))
    assert(html.contains("a &amp; b &lt; c &quot;quoted&quot;"))
    assert(html.contains("<h1>x&lt;y &amp; &quot;z&quot;</h1>"))

    val big = spark.range(25).selectExpr("id", "concat('row', id) AS label")
    val out2 = dir.resolve("big.html")
    assert(Report.writeReport(big, "big", out2.toString, maxRows = 10))
    val html2 = Files.readString(out2)
    assert(html2.contains("(truncated at 10 rows)"))
    assert("<tr><td>".r.findAllIn(html2).size === 10)
  }

  test("report R12: empty result writes NO artifact (inverted predicate, README.md:59-61)") {
    val dir = tmpDir()
    val products = Ingest.normalize(payloads, "payload")
    val none = Report.highVolumeSales(products, Double.MaxValue)
    val out = dir.resolve("report.html")
    assert(!Report.writeReport(none, "high volume sales", out.toString))
    assert(!Files.exists(out), "empty result must not leave an artifact")
  }

  test("toJsonPayload: reference {\"data\":[...]} shape; None when empty (R11/R12)") {
    val df = Seq(("MLA1", 2L)).toDF("id", "n")
    val some = Report.toJsonPayload(df)
    assert(some.exists(s => s.startsWith("{\"data\":[") && s.contains("\"id\":\"MLA1\"")))
    assert(Report.toJsonPayload(df.filter(lit(false))).isEmpty)
  }

  test("upsert: updates win (including to null), existing survive, inserts append") {
    val existing = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(20.0)),
      (3L, Option("c"), Option(30.0))).toDF("k", "s", "v")
    val updates = Seq(
      (2L, Option("B"), Option.empty[Double]), // match: overwrite, v → null
      (4L, Option("d"), Option(40.0)))         // no match: insert
      .toDF("k", "s", "v")
    val got = Ingest.upsert(existing, updates, "k")
      .orderBy("k").as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("B"), None), // null update value overwrites — match
                             // structure decides, not null-coalescing
      (3L, Some("c"), Some(30.0)),
      (4L, Some("d"), Some(40.0))))
  }

  test("scd2: collapses no-change rows, intervals chain, null-first opens a version") {
    val log = Seq(
      // key 1: a→a (collapse)→b→b (collapse)→a : three versions
      (1L, 10L, 100L, Option("a")),
      (1L, 20L, 101L, Option("a")),
      (1L, 30L, 102L, Option("b")),
      (1L, 40L, 103L, Option("b")),
      (1L, 50L, 104L, Option("a")),
      // key 2: null-first opens, null→x is a change, x→null is a change
      (2L, 10L, 200L, Option.empty[String]),
      (2L, 20L, 201L, Option("x")),
      (2L, 30L, 202L, Option.empty[String])
    ).toDF("k", "seq", "tie", "attr")
    val out = Ingest.scd2(log, "k", "seq", "tie", "attr")
      .select("k", "seq", "attr", "effective_from", "effective_to", "is_current")
      .as[(Long, Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(out === Seq(
      (1L, 10L, Some("a"), 10L, Some(30L), false),
      (1L, 30L, Some("b"), 30L, Some(50L), false),
      (1L, 50L, Some("a"), 50L, None, true),
      (2L, 10L, None, 10L, Some(20L), false),
      (2L, 20L, Some("x"), 20L, Some(30L), false),
      (2L, 30L, None, 30L, None, true)))
    // exactly one current version per key
    assert(out.filter(_._6).map(_._1) === Seq(1L, 2L))
  }

  test("upsert rejects mismatched schemas and missing keys") {
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Ingest.upsert(a, Seq((1L, 2.0)).toDF("k", "v"), "k")
    }
    intercept[IllegalArgumentException] {
      Ingest.upsert(a, a, "nope")
    }
  }

  test("tableDiff: added/removed/changed/unchanged, null-safe on every column") {
    val oldDf = Seq(
      (1L, Option("a"), Option(1.0)),  // unchanged
      (2L, Option("b"), Option(2.0)),  // changed (value)
      (3L, Option.empty[String], Option(3.0)), // unchanged (null == null)
      (4L, Option("d"), Option(4.0)),  // changed (value → null)
      (5L, Option("e"), Option(5.0))   // removed
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, Option("a"), Option(1.0)),
      (2L, Option("B"), Option(2.0)),
      (3L, Option.empty[String], Option(3.0)),
      (4L, Option("d"), Option.empty[Double]),
      (6L, Option("f"), Option(6.0))   // added
    ).toDF("k", "s", "v")
    val got = Ingest.tableDiff(oldDf, newDf, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "unchanged"),
      (4L, "changed"), (5L, "removed"), (6L, "added")))
    intercept[IllegalArgumentException] {
      Ingest.tableDiff(oldDf, Seq((1L, "x")).toDF("k", "s"), "k")
    }
  }

  test("aggState ∘ mergeAggState equals a single pass at any batch split") {
    val rows = Seq(
      (1L, Option(10.0)), (1L, Option(0.5)), (1L, Option.empty[Double]),
      (2L, Option(-3.25)), (2L, Option(7.0)), (3L, Option(0.0)))
      .toDF("k", "v")
    val single = Ingest.aggState(rows, "k", "v")
    for (splitAt <- Seq(0.0, 1.0, 8.0)) {
      val merged = Ingest.mergeAggState(
        Ingest.aggState(rows.filter(col("v").isNull || col("v") < splitAt), "k", "v"),
        Ingest.aggState(rows.filter(col("v") >= splitAt), "k", "v"), "k")
      assert(merged.orderBy("k").collect().toSeq ===
        single.orderBy("k").collect().toSeq, s"split at $splitAt")
    }
  }

  test("flagship e2e on sf0.001: real threshold writes a report, inverted one does not") {
    val dir = tmpDir()
    val written = SparkEntry.runFlagship(spark, sfDir, 1000000.0,
      dir.resolve("flagship.html").toString)
    assert(written && Files.exists(dir.resolve("flagship.html")))

    val empty = SparkEntry.runFlagship(spark, sfDir, Double.MaxValue,
      dir.resolve("empty.html").toString)
    assert(!empty && !Files.exists(dir.resolve("empty.html")))
  }

  test("joinViewDelta: maintained view equals the one-shot join row-for-row; all three delta terms fire") {
    import spark.implicits._
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "lv")
    val r = Seq((1L, 10), (2L, 20), (2L, 21), (4L, 40)).toDF("k", "rv")
    // batches split by UNRELATED criteria so cross terms carry rows
    val lB = Seq(l.filter(col("lv").isin("a", "c")),
      l.filter(col("lv").isin("b", "d")), l.filter(col("lv") === "e"))
    val rB = Seq(r.filter(col("rv") === 21), r.filter(col("rv").isin(10, 40)),
      r.filter(col("rv") === 20))
    var (lAcc, rAcc) = (l.limit(0), r.limit(0))
    var view = l.join(r, Seq("k")).limit(0)
    var crossRows = 0L
    for (i <- 0 to 2) {
      val d = Ingest.joinViewDelta(lAcc, rAcc, lB(i), rB(i), "k")
      crossRows += lB(i).join(rAcc, Seq("k")).count() +
        lAcc.join(rB(i), Seq("k")).count()
      view = view.unionByName(d)
      lAcc = lAcc.unionByName(lB(i)); rAcc = rAcc.unionByName(rB(i))
    }
    assert(crossRows > 0, "batch split failed to exercise the cross-batch terms")
    val got = view.as[(Long, String, Int)].collect().sorted.toSeq
    val exp = l.join(r, Seq("k")).as[(Long, String, Int)].collect().sorted.toSeq
    assert(got === exp)
  }
}
