package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe answering the SCALE.md r16 question about q348:
  * the gated fixture holds 16 FIXED cluster boxes, so its ε-pair
  * count grows ∝ n² (the sf1 run's 37.7× wall) — is the dbscan
  * KERNEL itself linear when the corpus grows the way real data
  * does, at CONSTANT density? This probe scales the planted cluster
  * COUNT with n (k = n/94, same ~80-point dense box population at
  * every size), runs Cluster.dbscan at 15k / 150k / 1.5M points,
  * and prints wall + shuffle — constant local density ⇒ pairs ∝ n ⇒
  * the wall should read ~linear. Centers keep ≥ 6000 units of
  * separation head-room on a grid that widens with k (content-
  * addressed md5 coordinates, collisions immaterial to the timing
  * question). NOT part of the driver contract. */
object ClusterScaleProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_DBSCAN_SIZES",
      "15000,150000,1500000").split(',').map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new MetricsAcc
    spark.sparkContext.addSparkListener(acc)
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    def hex(tag: String, k: org.apache.spark.sql.Column, n: Int) =
      conv(substring(md5(concat_ws(":", lit(tag), k)), 1, n), 16, 10)
        .cast("long")

    for (n <- sizes) {
      val kClusters = math.max(16L, n / 94)
      // grid side grows with √k so center density (and box overlap
      // odds) stay constant across sizes
      val side = 250000L * math.round(math.sqrt(kClusters.toDouble))
      val base = spark.range(1, n + 1).select(col("id"))
        .withColumn("k", col("id") % kClusters)
        .withColumn("noise", hex("dbn", col("id"), 4) % 5 === 0)
      val pts = base.select(col("id"),
        when(col("noise"), hex("dbux", col("id"), 8) % side)
          .otherwise(hex("dbcx", col("k"), 8) % (side - 100000L) + 50000L +
            hex("dbjx", col("id"), 6) % 1801L - 900L).as("x"),
        when(col("noise"), hex("dbuy", col("id"), 8) % side)
          .otherwise(hex("dbcy", col("k"), 8) % (side - 100000L) + 50000L +
            hex("dbjy", col("id"), 6) % 1801L - 900L).as("y"))
      Thread.sleep(1000); acc.reset()
      val t0 = System.nanoTime()
      val out = graft.ops.Cluster.dbscan(pts, 1000L, 6)
        .groupBy(col("role")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[dbscan-probe] n=$n k=$kClusters sec=$sec%.2f " +
        f"shuffle_read_mb=${acc.shufRead.get / 1e6}%.1f " +
        f"disk_spill_mb=${acc.diskSpill.get / 1e6}%.1f " +
        s"roles=$out")
    }
    spark.stop()
  }
}
