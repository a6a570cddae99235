package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * trusting a new drop of upstream data: row count, null count,
  * distinct count, min/max per column, as one tidy row per column.
  *
  * Scale shape: ONE aggregation over ONE scan for all columns (the
  * naive per-column loop scans the table N times). The multi-
  * countDistinct plans as a single Expand + aggregate — the standard
  * Spark shape for mixed distinct aggregates; for TB-scale profiling
  * swap `countDistinct` for `approx_count_distinct` at the call site
  * (same output schema, sketch-sized state). The single result row
  * then explodes into per-column rows driver-free.
  *
  * min/max surface as strings so heterogeneous columns share one
  * output schema. Callers that need engine-portable output (the q89
  * oracle) should profile string/integral columns — float→string and
  * timestamp→string formatting is engine-specific.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__nonnull"),
        countDistinct(col(c)).as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__${c}__nonnull")).as("n_null"),
        col(s"__${c}__distinct").as("n_distinct"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
