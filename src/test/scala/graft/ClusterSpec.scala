package graft

import graft.ops.Cluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Sequential reference DBSCAN — naive O(n²) neighborhoods, core =
    * |N_eps incl. self| >= minPts, clusters = components of the
    * core-core eps-graph labelled by min core id, border = min
    * adjacent core's cluster (the operator's documented deterministic
    * variant). Shares no code with the Spark side. */
  private def refDbscan(pts: Seq[(Long, Long, Long)], eps: Long,
                        minPts: Int): Map[Long, (String, Option[Long])] = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val (dx, dy) = (a._2 - b._2, a._3 - b._3)
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // min-label fixpoint over core-core edges
    var lab = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n))
        if (lab(n) < lab(c)) { lab += c -> lab(n); changed = true }
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> ("core", Some(lab(id)))
      else {
        val coreNbrs = nbrs(id).filter(core)
        if (coreNbrs.nonEmpty)
          id -> ("border", Some(coreNbrs.map(lab).min))
        else id -> ("noise", None)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) =
    Cluster.dbscan(pts.toDF("id", "x", "y"), eps, minPts)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("dbscan: two blobs, a bridge-free gap, a border point, and far noise") {
    // blob A: 4 mutually-near points at ~(0,0); blob B: 4 at
    // ~(100,100); point 9 hangs off blob A at distance eps from one
    // core but with too few neighbors itself (border); point 10 far
    // from everything (noise). eps=5, minPts=4.
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 3L), (4L, 2L, 2L),
      (5L, 100L, 100L), (6L, 103L, 100L), (7L, 100L, 103L), (8L, 102L, 102L),
      (9L, 7L, 0L),   // within 5 of only id 2 → border of A
      (10L, 500L, 500L))
    val got = run(pts, 5L, 4)
    assert(got === refDbscan(pts, 5L, 4))
    assert(got(1L) === ("core", Some(1L)) && got(5L) === ("core", Some(5L)))
    assert(got(9L)._1 === "border" && got(9L)._2 === Some(1L))
    assert(got(10L) === ("noise", None))
  }

  test("dbscan: a density-connected SNAKE is one cluster (the deep-chain case ccStar exists for)") {
    // 40 points in a line, spacing 3, eps 4: each interior point sees
    // 2 neighbors + self = 3 → minPts=3 makes the whole snake core
    // and ONE component 120 units long (diameter ≫ eps)
    val pts = (0L until 40L).map(i => (i + 1, i * 3, 0L))
    val got = run(pts, 4L, 3)
    assert(got === refDbscan(pts, 4L, 3))
    // one cluster; its label is the min CORE id (2 — the endpoints
    // are border, so id 1 is not a core and cannot label it)
    assert(got.values.map(_._2).toSet === Set(Some(2L)))
    // endpoints see only 1 neighbor + self = 2 < 3 → border, not core
    assert(got(1L)._1 === "border" && got(40L)._1 === "border")
    assert(got(2L)._1 === "core")
  }

  test("dbscan: isolated core pair keeps its own min id (ccStar isolates patched); grid cell boundaries lose no pair") {
    // two points exactly eps apart STRADDLING a cell boundary
    // (x = 999 and 1004, eps = 5 → cells 199 and 200), minPts = 2:
    // both core, one 2-node cluster labelled by the min id
    val pts = Seq((7L, 999L, 0L), (8L, 1004L, 0L), (9L, 5000L, 5000L))
    val got = run(pts, 5L, 2)
    assert(got === refDbscan(pts, 5L, 2))
    assert(got(7L) === ("core", Some(7L)) && got(8L) === ("core", Some(7L)))
    assert(got(9L) === ("noise", None))
  }

  test("dbscan matches the sequential reference on a random field and is partition-invariant") {
    val rnd = new scala.util.Random(41)
    // three planted blobs + uniform noise on a 1000² field
    val blob = for {
      k <- 0 until 3; i <- 0 until 12
    } yield ((k * 12 + i + 1).toLong,
      (k * 300 + 100 + rnd.nextInt(40)).toLong,
      (k * 300 + 100 + rnd.nextInt(40)).toLong)
    val noise = (0 until 20).map(i =>
      ((100 + i).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val pts = blob ++ noise
    val ref = refDbscan(pts, 30L, 4)
    assert(run(pts, 30L, 4) === ref)
    val rep = Cluster.dbscan(pts.toDF("id", "x", "y").repartition(7), 30L, 4)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rep === ref)
  }

  test("dbscan fails loudly on negative coordinates (grid precondition guard)") {
    // ADVICE r16: negative coords silently split grid cells at the
    // origin and drop ε-pairs — must error, not mislabel.
    val pts = Seq((1L, 5L, 5L), (2L, -3L, 5L), (3L, 7L, 7L))
    val e = intercept[Exception] {
      Cluster.dbscan(pts.toDF("id", "x", "y"), 10L, 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-negative")), s"wrong error: $e")
  }
}
