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
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column bucket key variant (e.g. the LSH band index bucketed
    * on (band, bucket)): joins on the full key column set run
    * Exchange-free, same as the single-key form. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "at least one bucket key")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Directory-partitioned parquet: the partition-pruning layout.
    * Partition columns must be low-cardinality (each value = one
    * directory; a high-cardinality partition key is the classic
    * small-files trap). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Fixed-size training shards: ~`rowsPerShard` rows per output file,
    * globally ordered by `orderCol` so shard N's key range precedes
    * shard N+1's (range partition → maxRecordsPerFile split within
    * each range). Training loaders want many same-sized files they can
    * assign round-robin to data-loader workers; one giant file (or a
    * long tail of tiny ones) serializes the input pipeline.
    *
    * `numShards` sets the range-partition fan-out — at 100 TB pick
    * total_rows / rowsPerShard / ~4 so each task writes a few files;
    * repartitionByRange samples the order key rather than sorting
    * globally, and maxRecordsPerFile caps file size without a second
    * pass. Determinism note: range boundaries come from reservoir
    * sampling, so file ASSIGNMENT may vary run-to-run at boundaries —
    * file CONTENT ordering within a shard is pinned by the sort. */
  def writeShards(df: DataFrame, path: String, orderCol: String,
                  rowsPerShard: Int, numShards: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(rowsPerShard >= 1 && numShards >= 1, "positive shard sizing")
    df.repartitionByRange(numShards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerShard.toLong)
      .parquet(path)
  }
}
