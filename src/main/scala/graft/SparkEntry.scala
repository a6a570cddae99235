package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2B), one named query
  * per operator; `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query (same column NAMES and ORDER BY — the driver
  * sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §2C): the reference pipeline's semantics
    * on fixture data — scan lineitem, derive revenue = price × quantity
    * (reference: mercadolibre_pipeline_dag.py:75), threshold filter,
    * report projection with dd-MM-yyyy date (R10). Driver smoke-checks
    * rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    flagshipReport(spark, "/root/testdata/sf0.001", 1000000.0)

  /** The §2C report query, parameterized by fixture dir + threshold
    * (threshold inversion gives the reference's forced-empty validation
    * case, README.md:59-61). */
  def flagshipReport(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("revenue", col("l_extendedprice") * col("l_quantity"))
      .filter(col("revenue") >= lit(threshold))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("revenue"),
        date_format(col("l_shipdate"), "dd-MM-yyyy").as("report_date"))
      .orderBy(desc("revenue"), col("l_orderkey"), col("l_linenumber"))

  /** §2C end-to-end: query → emptiness short-circuit → HTML render →
    * file sink (R8-R15). Returns true iff a report artifact was
    * written; an empty result writes NOTHING (reference README.md:46-49). */
  def runFlagship(spark: SparkSession, dir: String, threshold: Double,
                  outPath: String): Boolean =
    graft.pipeline.Report.writeReport(
      flagshipReport(spark, dir, threshold), "high volume sales", outPath)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    RelationalQueries.queries ++
    JoinQueries.queries ++
    AggQueries.queries ++
    WindowQueries.queries ++
    ScalarQueries.queries ++
    LlmQueries.queries ++
    EventQueries.queries ++
    PipelineQueries.queries ++
    StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
    JoinQueries.oracles ++
    AggQueries.oracles ++
    WindowQueries.oracles ++
    ScalarQueries.oracles ++
    LlmQueries.oracles ++
    EventQueries.oracles ++
    PipelineQueries.oracles ++
    StatQueries.oracles
}
