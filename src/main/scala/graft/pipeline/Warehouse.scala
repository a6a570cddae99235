package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

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
    * small-files trap).
    *
    * Rows are REPARTITIONED on the partition columns before the write:
    * without it, every write task sees rows of every partition value
    * and emits one file per (task × value) — tasks × directories tiny
    * files, the OTHER small-files trap, which at warehouse scale
    * multiplies NameNode/listing load and per-file open cost on every
    * later read. Co-locating first bounds the count at one file per
    * populated directory (hash collisions can still co-locate several
    * values in one task — still one file per directory). At true
    * 100 TB a single hot partition value may then exceed one task's
    * comfort; that case wants an additional within-partition salt
    * column in the repartition key, which callers can do themselves —
    * the fixture months are uniform, so the simple form is right
    * here. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** DAY-GRAIN REVENUE ROLLUP — the materialized view behind
    * `plans.RewriteAggOnRollup` (q336): (day, l_returnflag) →
    * (rev DECIMAL(18,4), cnt BIGINT). Partial decimal sums are
    * ASSOCIATIVE, so re-aggregating the dailies is bit-identical to
    * aggregating the fact table — the property that lets the rewrite
    * stay under the hash gate. Stored rev keeps SUM's native
    * DECIMAL(28,4): a downcast to (18,4) would turn a data-dependent
    * overflow into a silent NULL that SUM skips (non-ANSI mode) — a
    * silently-wrong rewrite (r15, ADVICE). The rewrite re-derives the
    * original DECIMAL(28,4) output type by casting its SUM(rev) (which
    * widens to (38,4)) back down — exact, since the true total fits
    * (28,4) by construction. Incremental maintenance is the q151 agg-state
    * discipline: ingest MERGEs per-day partials instead of rebuilding. */
  def writeDailyRevenueRollup(lineitem: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    // truncate via DATE so `day` keeps l_shipdate's TIMESTAMP_NTZ type
    // (date_trunc converts NTZ→LTZ, and a type-mismatched comparison
    // in the rewritten Filter would unresolve the plan — found live)
    lineitem.groupBy(
        col("l_shipdate").cast("date").cast("timestamp_ntz").as("day"),
        col("l_returnflag"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ORDER (Morton) key: interleave the low `bitsPer` bits of two
    * non-negative integer columns — the multi-dimensional data-skipping
    * layout. Sorting/range-partitioning files by the z key keeps BOTH
    * columns' per-file min/max spans narrow simultaneously, so scans
    * filtered on EITHER dimension skip most files via parquet
    * min/max stats; a single-column sort clusters that column only and
    * leaves the other's spans at the full range (WarehouseSpec
    * measures exactly this on the lineitem fixture).
    *
    * Declarative bit fold (aggregate over bit positions, floor-div
    * arithmetic — `functions.shiftright` takes only literal shifts) —
    * codegen'd, no UDF, and engine-portable: q126 hash-matches the
    * same arithmetic in DuckDB. Values must lie in [0, 2^bitsPer);
    * all intermediates stay integral and far below 2^53, so the
    * double-arithmetic fold is exact.
    *
    * NORMALIZE FIRST: interleaving only clusters both dimensions when
    * they occupy comparable bit widths — a 7-bit column interleaved
    * with a 14-bit one leaves the top z bits owned entirely by the
    * wide column and the layout degenerates to a single-column sort.
    * Scale each dim to the full [0, 2^bitsPer) range first (min/max
    * scaling off a one-row broadcast aggregate, or rank scaling);
    * WarehouseSpec measures the clustering with and without. */
  def zOrderKey(x: Column, y: Column, bitsPer: Int): Column = {
    import org.apache.spark.sql.functions._
    require(bitsPer >= 1 && bitsPer <= 26, "bitsPer must be in [1, 26]")
    def bit(c: Column, i: Column) =
      pmod(floor(c.cast("double") / pow(lit(2.0), i)), lit(2.0))
    aggregate(
      sequence(lit(0), lit(bitsPer - 1)), lit(0.0),
      (acc, i) => acc + (bit(x, i) + bit(y, i) * 2.0) * pow(lit(4.0), i))
      .cast("long")
  }

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

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): shard(key) = argmax over s of h(key, s) — the
    * consistent-hashing rule for assigning rows to a RESIZABLE set of
    * shards/workers. Under mod-hashing, growing N → N+1 remaps ~N/(N+1)
    * of all keys (a full reshuffle of the training corpus); under HRW
    * exactly the keys whose NEW shard's hash wins move — ~1/(N+1) — and
    * every mover lands ON the new shard (the property WarehouseSpec
    * pins, and the q158 gate exercises cross-engine).
    *
    * Row-local and codegen'd: `shards` md5 evaluations per row, no
    * shuffle, no coordination state — the whole point vs a lookup
    * table. md5 (not xxhash64) so any engine replays the assignment
    * bit-for-bit; hex strings compare lexicographically. A null key
    * yields a null shard (md5(null) propagates) — callers route null
    * keys explicitly rather than silently pinning them to one shard. */
  def rendezvousShard(key: Column, shards: Int): Column = {
    import org.apache.spark.sql.functions._
    require(shards >= 1, "need at least one shard")
    val hashes = transform(sequence(lit(0), lit(shards - 1)),
      s => md5(concat(key.cast("string"), lit(":"), s.cast("string"))))
    (array_position(hashes, array_max(hashes)) - 1).cast("int")
  }
}
