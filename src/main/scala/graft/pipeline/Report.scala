package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The reference's query → branch → render → sink half, R8-R15
  * (reference: mercadolibre_pipeline_dag.py:67-138,161-177).
  *
  * Control flow lives in the Scala driver, exactly like the reference's
  * ShortCircuitOperator lives in Airflow, NOT in the dataflow plan
  * (SURVEY.md EP3): the emptiness test is `df.isEmpty` (a cheap
  * limit-1 job), and an empty result produces NO artifact at all — not
  * an empty report (README.md:46-49 semantics, verified by the
  * inverted-predicate golden test mirroring README.md:59-61).
  *
  * The render collects to the driver: reports are human-sized BY
  * CONSTRUCTION (they sit behind a threshold filter / top-k — the
  * reference emails the rows to a person). The scale-discipline rule
  * "no collect in a hot path" applies to operators, not to a
  * report sink whose output is bounded by what a human reads. */
object Report {

  /** R8+R9+R10 on the reference's products schema: computed-predicate
    * threshold filter + report projection with dd-MM-yyyy dates. */
  def highVolumeSales(products: DataFrame, threshold: Double): DataFrame =
    products
      .filter(col("price") * col("sold_quantity") >= lit(threshold)) // R9
      .select(                                                        // R5/R10
        col("id"), col("site_id"), col("title"),
        col("price"), col("sold_quantity"), col("thumbnail"),
        date_format(col("created_date"), "dd-MM-yyyy").as("created_date"))

  /** R11: result rows → the reference's {"data":[{...}]} JSON payload
    * (reference :76-87). R12: empty ⇒ None. */
  def toJsonPayload(result: DataFrame): Option[String] = {
    val rows = result.toJSON.collect()
    if (rows.isEmpty) None else Some(rows.mkString("{\"data\":[", ",", "]}"))
  }

  /** Minimal HTML escaping for text interpolated into markup: the five
    * characters with syntactic meaning. Without this, a document cell
    * containing `</table><script>` corrupts or injects into the
    * artifact. */
  private[pipeline] def escapeHtml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&#39;"
      case c => c.toString
    }

  /** R13: rows → HTML report (reference's inline Jinja template
    * :96-129 — header + one table row per product). Pure function of
    * collected rows so it is trivially golden-testable. Every
    * interpolated value (title, column names, cells) is HTML-escaped;
    * null cells render empty. */
  def renderHtml(title: String, columns: Seq[String], rows: Seq[Row],
                 footerHtml: String = ""): String = {
    val t = escapeHtml(title)
    val head = columns.map(c => s"<th>${escapeHtml(c)}</th>").mkString
    val body = rows.map { r =>
      columns.indices.map { i =>
        val cell = Option(r.get(i)).map(v => escapeHtml(v.toString)).getOrElse("")
        s"<td>$cell</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"""<html><head><title>$t</title></head>
       |<body><h1>$t</h1>
       |<table><tr>$head</tr>
       |$body
       |</table>$footerHtml</body></html>""".stripMargin
  }

  /** R12+R13+R15: emptiness short-circuit, then render + file sink.
    * Returns true iff a report was written; empty input writes NOTHING
    * (no file — the reference skips every downstream task).
    *
    * The collect is BOUNDED: at most `maxRows` rows are rendered
    * (reports are human-sized; the reference emails rows to a person),
    * with a truncation marker row when the result has more — the
    * limit(maxRows + 1) read is how the sink detects overflow without
    * a second count job or an unbounded driver materialization. */
  def writeReport(result: DataFrame, title: String, outPath: String,
                  maxRows: Int = 10000): Boolean = {
    if (result.isEmpty) false // R12: short-circuit, no artifact
    else {
      val collected = result.limit(maxRows + 1).collect().toSeq
      val (shown, truncated) =
        if (collected.length > maxRows) (collected.take(maxRows), true)
        else (collected, false)
      val footer = if (truncated) s"<p>(truncated at $maxRows rows)</p>" else ""
      val html = renderHtml(title, result.columns.toSeq, shown, footer)
      Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
      Files.writeString(Paths.get(outPath), html)
      true
    }
  }
}
