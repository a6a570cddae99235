package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the bucket-on-src graph remedy (VERDICT r14 #1): the
  * SCALE.md lines for q171/q297/q268/q333 have CLAIMED for three rounds
  * that bucketing the edge list on its join key (Warehouse.writeBucketed,
  * the q96 discipline) deletes the edge-sized Exchanges from the wedge
  * join and every fixed-point superstep. This harness MEASURES it at the
  * real 10× fixture pair (sf0.01 vs sf0.1), the GroupedTopK-A/B
  * precedent:
  *
  *  - q171 triangles: orientation materialized once (Graph.orientEdges)
  *    and written bucketed on `s`; the wedge self-join then runs with no
  *    Exchange below the join (WarehouseSpec pins the plan; this probe
  *    times it).
  *  - q333 personalized PageRank: the trade edge list written bucketed
  *    on `src`; every superstep's edge⋈rank join and the degree
  *    aggregate are then Exchange-free — the only shuffle left per
  *    superstep is the node-sized contribution rollup.
  *
  * Each (dir, query) prints an A row (derive + compute from raw
  * parquet, the gated-query path), a WRITE row (the one-time bucketed
  * materialization — the amortized cost), and a B row (compute over the
  * bucketed table). The B timing runs COLD (first execution of that
  * plan, same as A — an assertSame-first ordering would pre-warm
  * codegen and the page cache and inflate the bucketed advantage);
  * its line is BUFFERED and printed only after results are asserted
  * IDENTICAL between A and B — a faster wrong answer crashes the
  * probe before its timing reaches the console. NOT part of the
  * driver contract.
  *
  * Usage: SPARK_GRAFT_PROBE_DIRS=/root/testdata/sf0.01,/root/testdata/sf0.1 \
  *          runMain graft.GraphBucketProbe
  */
object GraphBucketProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", cpus).toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.scratch("graft-warehouse-"))
    Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new MetricsAcc
    spark.sparkContext.addSparkListener(acc)
    // warmup (JIT/codegen/parquet reader), untimed
    spark.range(1000).selectExpr("sum(id)").collect()

    def timedLine(tag: String)(body: => Unit): String = {
      Thread.sleep(1000); acc.reset()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain straggler task-end events
      f"[bucket-probe] $tag sec=$sec%.2f " +
        f"shuffle_read_mb=${acc.shufRead.get / 1e6}%.1f " +
        f"shuffle_write_mb=${acc.shufWrite.get / 1e6}%.1f"
    }
    def timed(tag: String)(body: => Unit): Unit =
      println(timedLine(tag)(body))

    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
      val d = a.exceptAll(b).count() + b.exceptAll(a).count()
      require(d == 0, s"$what: bucketed result DIVERGED ($d rows differ)")
    }

    for (dir <- dirs) {
      val sf = dir.split('/').last

      // ---- q171 triangles: part co-purchase graph ----
      val ib = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val couEdges = ib.as("a")
        .join(ib.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      timed(s"dir=$sf q=triangles layout=raw") {
        run(graft.ops.Graph.triangleCounts(couEdges))
      }
      val triTbl = s"graft_probe_tri_${sf.replace('.', '_')}"
      timed(s"dir=$sf q=triangles layout=bucketed-write") {
        graft.pipeline.Warehouse.writeBucketed(
          graft.ops.Graph.orientEdges(couEdges), triTbl, "s", buckets)
      }
      try {
        val bLine = timedLine(s"dir=$sf q=triangles layout=bucketed") {
          run(graft.ops.Graph.triangleCountsOriented(spark.table(triTbl)))
        }
        assertSame(graft.ops.Graph.triangleCounts(couEdges),
          graft.ops.Graph.triangleCountsOriented(spark.table(triTbl)),
          s"$sf triangles")
        println(bLine)
      } finally spark.sql(s"DROP TABLE IF EXISTS $triTbl")

      // ---- q333 personalized PageRank: symmetrized trade graph ----
      val eb = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s1"))
        .distinct()
      val edges = eb.select(col("c").as("src"), col("s1").as("dst"))
        .unionByName(eb.select(col("s1").as("src"), col("c").as("dst")))
      val seeds = Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select((col("s_suppkey") * 2 + 1).as("node"))
      timed(s"dir=$sf q=ppr layout=raw") {
        run(graft.ops.Graph.personalizedPageRank(edges, seeds, 2))
      }
      val pprTbl = s"graft_probe_ppr_${sf.replace('.', '_')}"
      timed(s"dir=$sf q=ppr layout=bucketed-write") {
        graft.pipeline.Warehouse.writeBucketed(edges, pprTbl, "src", buckets)
      }
      try {
        val bLine = timedLine(s"dir=$sf q=ppr layout=bucketed") {
          run(graft.ops.Graph.personalizedPageRank(
            spark.table(pprTbl), seeds, 2))
        }
        assertSame(
          graft.ops.Graph.personalizedPageRank(edges, seeds, 2),
          graft.ops.Graph.personalizedPageRank(spark.table(pprTbl), seeds, 2),
          s"$sf ppr")
        println(bLine)
      } finally spark.sql(s"DROP TABLE IF EXISTS $pprTbl")

      // ---- q297 HITS over the same src-bucketed directed edges ----
      val directed = eb.select(col("c").as("src"), col("s1").as("dst"))
      timed(s"dir=$sf q=hits layout=raw") {
        run(graft.ops.Graph.hits(directed, 2))
      }
      val hitsTbl = s"graft_probe_hits_${sf.replace('.', '_')}"
      timed(s"dir=$sf q=hits layout=bucketed-write") {
        graft.pipeline.Warehouse.writeBucketed(directed, hitsTbl, "src", buckets)
      }
      try {
        val bLine = timedLine(s"dir=$sf q=hits layout=bucketed") {
          run(graft.ops.Graph.hits(spark.table(hitsTbl), 2))
        }
        assertSame(graft.ops.Graph.hits(directed, 2),
          graft.ops.Graph.hits(spark.table(hitsTbl), 2), s"$sf hits")
        println(bLine)
      } finally spark.sql(s"DROP TABLE IF EXISTS $hitsTbl")

      // ---- q387 walks: the symmetrized trade graph (VERDICT r19 #5:
      // the new family's largest shuffle — 5.4 GB at derived sf1 —
      // has never had the bucket A/B run). The bucketed leg writes
      // the NORMALIZED edge set (distinct — what deterministicWalks
      // derives internally) bucketed on src, then runs the Prepared
      // variant that trusts the layout: every one of the `length`
      // frontier⋈edges joins should drop its edge-sided Exchange.
      val wEdges = edges // the q333 symmetrized trade graph = q387's
      timed(s"dir=$sf q=walks layout=raw") {
        run(graft.ops.Graph.deterministicWalks(wEdges, 5))
      }
      val walkTbl = s"graft_probe_walks_${sf.replace('.', '_')}"
      timed(s"dir=$sf q=walks layout=bucketed-write") {
        graft.pipeline.Warehouse.writeBucketed(
          wEdges.select(col("src"), col("dst"))
            .filter(col("src").isNotNull && col("dst").isNotNull)
            .distinct(),
          walkTbl, "src", buckets)
      }
      try {
        val bLine = timedLine(s"dir=$sf q=walks layout=bucketed") {
          run(graft.ops.Graph.deterministicWalksPrepared(
            spark.table(walkTbl), 5))
        }
        assertSame(graft.ops.Graph.deterministicWalks(wEdges, 5),
          graft.ops.Graph.deterministicWalksPrepared(
            spark.table(walkTbl), 5),
          s"$sf walks")
        println(bLine)
      } finally spark.sql(s"DROP TABLE IF EXISTS $walkTbl")
    }
    spark.stop()
  }
}
