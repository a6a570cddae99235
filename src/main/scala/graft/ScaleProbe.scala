package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe (VERDICT r9 #5): run the heavy dedup family at
  * sf0.1 and at a DERIVED 10× corpus ("sf1") and measure wall time +
  * shuffle/spill bytes per query, turning SCALE.md's analytical
  * shuffle-volume claims into measured numbers. NOT part of the driver
  * contract (not in SparkEntry.queries) — a measurement harness.
  *
  * The sf1 corpus is derived from the sf0.1 fixtures, NOT synthesized
  * fresh, so the per-copy duplicate structure matches the real fixture:
  *  - documents ×N: copy c keeps doc order but suffixes every token
  *    with "_c" (c>0), so copies share NO shingles — corpus-internal
  *    near-dup rate per copy is exactly the fixture's, cluster sizes
  *    unchanged, corpus 10×. (Un-suffixed copies would make every doc
  *    a 10-member near-dup cluster — a different, artificial workload.)
  *  - embeddings ×N: copy c rotates each vector by 6·c positions —
  *    norms preserved, copies decorrelated, cell populations grow 10×.
  *
  * Usage: runMain graft.ScaleProbe [baseDir] [derivedDir] [factor]
  * Prints one line per (sf, query): seconds, shuffle read/write MB,
  * disk+memory spill MB. Listener totals are process-wide per query
  * (the probe runs queries serially, nothing else in flight).
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val derived = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples partition count from
    // thread count: the remedy for big-corpus spill is partitions ∝
    // data (what a real cluster does by adding executors) — the probe
    // must be able to MEASURE that, not just assert it (r14: q171 at
    // the 10× corpus spills 22 GB at 32 partitions).
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      // when the override is set, the probe is asking "what does N
      // partitions actually do" — AQE's advisory-size coalescing would
      // silently fold them back to ~the default and measure nothing
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        (!sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.scratch("graft-warehouse-"))
    Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    graft.expressions.VectorExpressions.register(spark)
    graft.expressions.TextExpressions.register(spark)
    graft.expressions.KllExpressions.register(spark)
    spark.experimental.extraOptimizations ++=
      Seq(graft.expressions.RewriteDotProduct, graft.expressions.RewriteRollingHash)
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROBE_DIRS=/a,/b probes REAL fixture dirs (e.g.
    // sf0.01 vs sf0.1 — a natural 10×) and skips the derived-corpus
    // build; without it, the documents/embeddings derivation runs.
    val probeDirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    if (probeDirs.isEmpty) deriveIfAbsent(spark, base, derived, factor)

    val acc = new MetricsAcc
    spark.sparkContext.addSparkListener(acc)
    val all = Seq("q70_lsh_neardup", "q72_near_dedup", "q81_near_dedup_cc",
      "q106_segment_dedup", "q109_semantic_dedup",
      // the round-10 persisted-index paths: q120 pays the one-time
      // index write at each scale, q122/q123 read the persisted
      // band/cell layouts — the incremental shapes the docs argue
      "q120_lsh_index_dedup", "q122_incremental_index_dedup",
      "q123_ivf_index_topk",
      // round-11: the exact prefix-filtered similarity join — the
      // candidate count tracks the corpus' near-dup structure (the
      // derived corpus preserves it per copy), so growth should be
      // linear like the LSH family, with zero spill
      "q147_prefix_simjoin",
      // CDC chunking: row-local cut + hash shuffle — the derived
      // corpus preserves per-copy span-dup structure (suffixed copies
      // chunk independently), so growth should be linear
      "q182_cdc_dedup",
      // round-11 fourth wave (probed across REAL fixture pairs via
      // SPARK_GRAFT_PROBE_DIRS below — these are lineitem/customer
      // shapes, not documents, so the derived corpus doesn't apply):
      // the Pregel loop, the deletion-neighborhood join, the
      // degree-oriented triangles, the basket-pair mining
      "q162_basket_lift", "q163_pagerank", "q164_edit_join",
      "q171_triangles",
      // round-11 eighth/ninth waves (fixture-pair shapes): the
      // Σdeg²-bounded wedge join, the fixed-size CM build (shuffle
      // should be ~scale-invariant — counters cap at depth×width per
      // partition), the windowed interval merge, the run-fold entropy
      // (zero shuffle — wall should track the scan), and the CM
      // join-size lifecycle over lineitem+orders
      "q185_adamic_adar", "q184_count_min", "q187_interval_coalesce",
      "q189_token_entropy", "q198_join_size_est",
      // round-11 continuation waves (fixture-pair shapes): the
      // cell-bucketed radius join (candidates ∝ n × density — 10×
      // points in the SAME grid area densifies, so expect pair-count
      // growth ~100× while the CANDIDATE fan-out stays 9 cells/point),
      // the 3-superstep HashMin loop on the thinned graph, the
      // broadcast MaxSim reduce (corpus×|Q| row-local dots, shuffle
      // only scalars), the 6-level frontier closure, and the
      // segment-set pair explosion (segments²-per-user, never n²)
      "q210_grid_proximity", "q212_label_propagation", "q215_maxsim",
      "q229_bom_explosion", "q234_audience_overlap",
      // the exact stickiness fan (user-days × 28 with a ×3 distinct
      // Expand — the documented exact-path price) and the day-
      // partitioned concurrency sweep (2 points/event, day-bounded)
      "q238_stickiness", "q248_peak_concurrency",
      // round-12 (fixture-pair shapes): the iterative k-core peel
      // (rounds × edge semi-joins — shuffle ∝ surviving edges per
      // round), the blocked JW self-join (Σ block² on a vocabulary-
      // sized name table — expect ~scale-invariant), the per-order
      // comparison fan (≤12 lines/order ⇒ linear), the bootstrap grid
      // (B × days — domain-sized, expect ~scale-invariant shuffle),
      // the 7-day touch×purchase attribution fan (per-user bounded),
      // and the sampled range planner (sample window + (k−1)-row
      // broadcast fan — shuffle tracks the 2% sample + assignment agg)
      "q268_kcore", "q264_jw_linkage", "q258_bradley_terry",
      "q269_bootstrap_ci", "q270_decay_attribution",
      "q273_range_split_planner",
      // round-13: the PQ/IVF-PQ lifecycles (codebook training scans ∝
      // corpus but shuffles only cells×dims scalars + m codes/vector —
      // expect ~linear wall, near-invariant shuffle), the 2-iteration
      // HITS fixed point (edge-keyed joins ∝ distinct (c,s) pairs),
      // the PPM perceptual-hash clusters (row-local decode, one tiny
      // group shuffle), the 30-day Theil–Sen pair median (day-domain —
      // expect scale-invariant), and the JW-pair connected components
      // (vocabulary-sized pair graph, ~invariant)
      "q293_pq_ann", "q301_ivfpq_ann", "q297_hits",
      "q298_image_phash_dedup", "q299_theil_sen", "q303_entity_resolution",
      // round-14 wave: the order-2 LM scoring (bigram model tables
      // shuffle ∝ distinct bigrams; score join co-partitioned — expect
      // ~linear wall, model-sized shuffle), the seed-restart PPR
      // (q163's edge-keyed shape: shuffle ∝ distinct (c,s) pairs),
      // the BFS frontier loop (per-level shuffle ∝ frontier
      // adjacency, 3 levels), the leave-one-out JSD (one token
      // aggregate + a vocab-bounded grid — expect scale-invariant
      // shuffle), the video container walk (row-local decode, hash
      // rows only — wall should track the scan), and the conformal
      // lifecycle (rankedByRange on the calibration split + two
      // broadcast score passes)
      "q326_bigram_logprob", "q333_personalized_pagerank",
      "q327_bfs_hops", "q334_source_drift", "q335_video_keyframes",
      "q330_conformal",
      // round-15 wave: the remaining top-10 bench heavies, probed at
      // the derived sf1 corpus (events/part now derive too) — grouped
      // MAD (one user aggregate + broadcast group stats), the
      // alignment-offset dotplot (rare-gram pair blocking), the
      // centroid classifier + BPE apply (corpus passes with
      // model-sized shuffles), reorder rates (order-pair fan), the
      // exact weighted median (rankedByRange), and the uplift curve
      // (user aggregate + 5-row quintile table)
      "q324_grouped_mad_outliers", "q339_align_offset", "q288_centroid_classifier",
      "q292_bpe_apply", "q318_reorder_rates", "q300_weighted_median",
      "q337_uplift_curve")
    // SPARK_GRAFT_PROBE_ONLY=q106,q120 restricts the family — the
    // 30–50× runs target just the linear-growth outliers rather than
    // paying the whole family at a corpus 3–5× the 10× one.
    val family = sys.env.get("SPARK_GRAFT_PROBE_ONLY") match {
      case Some(csv) =>
        val want = csv.split(',').map(_.trim).filter(_.nonEmpty)
        all.filter(q => want.exists(q.startsWith))
      case None => all
    }
    // warmup (JIT/codegen/parquet paths), untimed
    spark.range(1000).selectExpr("sum(id)").collect()
    for (dir <- probeDirs.getOrElse(Seq(base, derived)); name <- family) {
      // settle the async listener bus, then zero the counters
      Thread.sleep(1000); acc.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // free rankedByRange checkpoints once the noop write has
      // materialized (the Verify/Bench release discipline — q273/q330
      // would otherwise accumulate blocks across the probe run)
      graft.ops.Sampling.releaseCheckpoints()
      Thread.sleep(1000) // let straggler task-end events drain
      println(f"[probe] dir=$dir query=$name sec=$sec%.2f " +
        f"shuffle_read_mb=${acc.shufRead.get / 1e6}%.1f " +
        f"shuffle_write_mb=${acc.shufWrite.get / 1e6}%.1f " +
        f"disk_spill_mb=${acc.diskSpill.get / 1e6}%.1f " +
        f"mem_spill_mb=${acc.memSpill.get / 1e6}%.1f")
    }
    spark.stop()
  }

  /** Build the derived corpus once; skip when already on disk. */
  private def deriveIfAbsent(spark: SparkSession, base: String,
                             derived: String, factor: Int): Unit = {
    val done = new org.apache.hadoop.fs.Path(s"$derived/_DERIVED_V4")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(done)) return
    val docs = Tables.documents(spark, base)
    val nDocs = docs.count()
    val copies = spark.range(factor).select(col("id").cast("int").as("__c"))
    docs.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("__c") * nDocs)
      .withColumn("text",
        when(col("__c") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("__c"))), " ")))
      .drop("__c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$derived/documents.parquet")
    val emb = Tables.embeddings(spark, base)
    val nVec = emb.count()
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    emb.crossJoin(copies)
      .withColumn("vec_id", col("vec_id") + col("__c") * nVec)
      // modulo keeps the rotation meaningful at ANY factor (a raw
      // __c*6 shift beyond dims would slice to an unrotated copy)
      .withColumn("embedding", concat(
        slice(col("embedding"), pmod(col("__c") * 6, lit(dims)) + 1, lit(dims)),
        slice(col("embedding"), lit(1), pmod(col("__c") * 6, lit(dims)))))
      .drop("__c")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$derived/embeddings.parquet")
    // lineitem + orders ×N with DISJOINT key spaces per copy (every
    // key offset by c·(max+1)): the graph heavies (q171/q268 part
    // co-purchase, q297 customer–supplier HITS) then scale in the
    // CONSTANT-DENSITY regime — 10× nodes and 10× edges, per-copy
    // structure identical — which is what a 10×-bigger BUSINESS looks
    // like. (The sf0.01→sf0.1 fixture pair probes the OTHER regime:
    // same key space, 10× denser — the q297 25×-shuffle finding. Both
    // datapoints matter; SCALE.md reports them side by side.)
    val li = Tables.lineitem(spark, base)
    val ords = Tables.orders(spark, base)
    val Array(maxOrd, maxPart, maxSupp) = li
      .agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey"))
      .head().toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    val maxCust = ords.agg(max("o_custkey")).head().getLong(0) + 1L
    li.crossJoin(copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * maxOrd)
      .withColumn("l_partkey", col("l_partkey") + col("__c") * maxPart)
      .withColumn("l_suppkey", col("l_suppkey") + col("__c") * maxSupp)
      .drop("__c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$derived/lineitem.parquet")
    ords.crossJoin(copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * maxOrd)
      .withColumn("o_custkey", col("o_custkey") + col("__c") * maxCust)
      .drop("__c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$derived/orders.parquet")
    // part ×N on the SAME l_partkey offset (fixture invariant
    // max(p_partkey) = max(l_partkey), so joins stay consistent per
    // copy) and events ×N with disjoint user/event id spaces, same
    // calendar — 10× users on the same month is what a 10×-bigger
    // business's event stream looks like (r15: lets the event-analytic
    // heavies q324/q318/q330 join the above-sf0.1 table).
    Tables.part(spark, base).crossJoin(copies)
      .withColumn("p_partkey", col("p_partkey") + col("__c") * maxPart)
      .drop("__c")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$derived/part.parquet")
    // supplier ×N on lineitem's l_suppkey offset (same invariant as
    // part); nation/region are fixed 25/5-row dims — copied verbatim
    // (the seed joins q333/q327 run against them)
    Tables.supplier(spark, base).crossJoin(copies)
      .withColumn("s_suppkey", col("s_suppkey") + col("__c") * maxSupp)
      .drop("__c")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$derived/supplier.parquet")
    Tables.nation(spark, base).write.mode("overwrite")
      .parquet(s"$derived/nation.parquet")
    Tables.region(spark, base).write.mode("overwrite")
      .parquet(s"$derived/region.parquet")
    // customer ×N on orders' o_custkey offset (same invariant as
    // part/supplier; r16 — the FULL registry now runs at this corpus,
    // and the customer-side queries q348/q349/q15/q119… need it)
    Tables.customer(spark, base).crossJoin(copies)
      .withColumn("c_custkey", col("c_custkey") + col("__c") * maxCust)
      .drop("__c")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$derived/customer.parquet")
    val ev = Tables.events(spark, base)
    val Array(maxUser, maxEid) = ev.agg(max("user_id"), max("event_id"))
      .head().toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    ev.crossJoin(copies)
      .withColumn("user_id", col("user_id") + col("__c") * maxUser)
      .withColumn("event_id", col("event_id") + col("__c") * maxEid)
      .drop("__c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$derived/events.parquet")
    fs.create(done, true).close()
  }
}
