package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Config-time extension check — the one seam ExtensionsSpec cannot
  * cover in-process (one SparkContext per JVM; the shared test session
  * is built before `spark.sql.extensions` could apply): builds a FRESH
  * session with `spark.sql.extensions=graft.expressions.GraftExtensions`
  * and proves that (a) every graft_* function resolves in SQL with no
  * runtime registration call, and (b) both injected optimizer rules
  * fire on the declarative forms. Exits non-zero on any failure —
  * runnable as a standalone gate: `sbt "runMain graft.ExtCheck"`. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extcheck")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      // (a) SQL resolution through the injected registry — no
      // VectorExpressions.register / TextExpressions.register calls.
      val d = spark.sql("SELECT graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
        .collect()(0).getDouble(0)
      require(d == 11.0, s"graft_dot: $d")
      val rh = spark.sql("SELECT graft_rolling_hash('abc') AS h")
        .collect()(0).getLong(0)
      require(rh == ((97L * 31 + 98) * 31 + 99) % 1000000007L, s"graft_rolling_hash: $rh")
      require(!spark.sql("SELECT graft_simhash(array('a', 'b')) AS s")
        .collect()(0).isNullAt(0), "graft_simhash null")
      require(spark.sql("SELECT graft_minhash(array('a', 'b'), 4, 7) AS m")
        .collect()(0).getSeq[Long](0).length == 4, "graft_minhash arity")

      // (b) both optimizer rules injected at config time rewrite the
      // declarative forms. Inputs derive from range() — a constant
      // (LocalRelation) input would be folded to values before the
      // rewritten expression could be observed in the plan.
      val base = spark.range(1).select(
        array(($"id" + 1).cast("float"), ($"id" + 2).cast("float")).as("a"),
        array(($"id" + 3).cast("float"), ($"id" + 4).cast("float")).as("b"),
        concat(lit("ab"), $"id".cast("string")).as("t"))
      val dotPlan = base
        .select(graft.ops.Similarity.dot(col("a"), col("b")))
        .queryExecution.optimizedPlan
      require(dotPlan.collect { case n => n.expressions }.flatten
        .exists(_.exists(_.isInstanceOf[graft.expressions.DotProductF32])),
        s"RewriteDotProduct did not fire:\n$dotPlan")
      val rhPlan = base
        .select(graft.ops.TextAnalysis.rollingHashHof(col("t")))
        .queryExecution.optimizedPlan
      require(rhPlan.collect { case n => n.expressions }.flatten
        .exists(_.exists(_.isInstanceOf[graft.expressions.RollingHashMod])),
        s"RewriteRollingHash did not fire:\n$rhPlan")

      println("[extcheck] config-time extensions OK: 5 functions resolve, 2 rules fire")
    } finally spark.stop()
  }
}
