package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Write-side storage layout for the 100 TB deployment (SURVEY.md §4
  * "partitioned Parquet layout", prompt mandate "co-locate joins via
  * bucketing"): the two levers that remove whole shuffle/scan stages
  * before a query ever runs.
  *
  *  - BUCKETING: both sides of a recurring equi join written with the
  *    same bucket count on the join key join WITHOUT an Exchange (and
  *    with sortBy, without a Sort) — the shuffle is paid once at write
  *    time and amortized over every subsequent join. WarehouseSpec
  *    asserts the Exchange-free plan.
  *  - PARTITIONING: low-cardinality predicate columns (dates, regions)
  *    as directory partitions; a filtered read lists only matching
  *    directories (PartitionFilters in the scan — never touches the
  *    other files' bytes). WarehouseSpec asserts the pruned scan.
  */
object Warehouse {

  /** Bucketed + sorted managed table: the co-located-join layout.
    * Requires saveAsTable (bucket metadata lives in the catalog; plain
    * .parquet(path) cannot record it). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Directory-partitioned parquet: the partition-pruning layout.
    * Partition columns must be low-cardinality (each value = one
    * directory; a high-cardinality partition key is the classic
    * small-files trap). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
