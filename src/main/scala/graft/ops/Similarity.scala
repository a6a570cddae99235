package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2B
  * "LLM-data-pipeline extensions"): UDF-free vector math via
  * higher-order functions, brute-force top-k as the exact baseline, and
  * an IVF-style cell-probed variant as the scale path.
  *
  * Scale design:
  *  - all vector math is built-in expressions (`zip_with` +
  *    `aggregate`), accumulated in Double (SURVEY §7.4: float
  *    accumulation drifts) — stays inside WholeStageCodegen.
  *  - top-k is `orderBy.limit` → TakeOrderedAndProject: per-partition
  *    bounded heap + single driver merge of k rows. Never a global sort.
  *  - the query side of a search is a single broadcast row — fixed-size
  *    at any corpus scale, so the broadcast hint is scale-safe.
  *  - IVF: corpus partitioned once into C cells by nearest centroid
  *    (write-time layout at 100 TB: partition directories by cell_id →
  *    partition pruning makes a probe read only nProbe/C of the data).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in Double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Exact brute-force top-k by dot product against a one-row query
    * DataFrame holding the query vector in `queryVecCol`. */
  def topKDot(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, queryVecCol: String, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** Assign every corpus vector to its nearest centroid (max dot
    * product). Centroids are a small fixed set → broadcast; the
    * argmax is a window row_number over (id) — one shuffle, done ONCE
    * at index-build time, amortized over all queries. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("__score", dot(col(vecCol), col("c_vec")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("__score"), col("cell_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("cell_id"))
  }

  /** Random-hyperplane (SimHash-for-cosine) LSH sketch: bit j of the
    * sketch is the sign of v · r_j for a fixed pseudo-random hyperplane
    * r_j. P[bit differs] = angle(a,b)/π, so Hamming distance estimates
    * cosine distance. Hyperplanes are generated driver-side from a
    * FIXED seed (deterministic across runs/executors) and inlined as
    * literals — the whole sketch stays codegen'd, no UDF.
    *
    * Scale path for embedding near-dup: group by sketch (or by bands of
    * it) and compare only within buckets — the cosine analog of
    * Dedup.lshCandidatePairs; candidates then rescore with exact
    * `cosine`. */
  def cosineSketch(vec: Column, dims: Int, bits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dims)(rnd.nextGaussian()))
    val bitCols = planes.zipWithIndex.map { case (plane, j) =>
      val planeLit = array(plane.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _) // disjoint bit positions — sum == bitwise OR
  }

  /** Embedding near-duplicate pairs via the banded cosine sketch — the
    * scale path q48's bounded brute-force baseline points at.
    *
    * Bands the `bits`-bit hyperplane sketch into `bands` slices of
    * bits/bands bits; two vectors become a candidate iff a full band
    * matches (the Hamming analog of MinHash banding — near-identical
    * vectors flip few sketch bits, so some band survives intact).
    * Candidates are then rescored with EXACT cosine and thresholded, so
    * banding affects recall only, never precision.
    *
    * Shuffle discipline: the band self-join carries (band-key, id) —
    * never the vectors; vectors are fetched by two id-equi-joins only
    * for the (sub-quadratic) candidate set. Deterministic: seeded
    * hyperplanes, no rand(). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         dims: Int, bits: Int, bands: Int, threshold: Double,
                         seed: Long = 42L): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val r = bits / bands
    val mask = (1L << r) - 1
    val sk = df.select(col(idCol).as("id"),
      cosineSketch(col(vecCol), dims, bits, seed).as("sk"))
    val banded = sk.select(col("id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sk"), b * r).bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
    val cand = banded.select(col("bk"), col("id").as("id_a"))
      .join(banded.select(col("bk"), col("id").as("id_b")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val vecs = df.select(col(idCol), col(vecCol))
    cand
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__va"), col("__vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF probe: exact top-k restricted to the nProbe cells whose
    * centroids score best against the query. The centroid ranking is a
    * C-row computation (fixed size) and the corpus filter on cell_id is
    * partition-prunable when the corpus is laid out by cell. */
  def ivfTopK(indexedCorpus: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame, query: DataFrame, queryVecCol: String,
              k: Int, nProbe: Int): DataFrame = {
    val probeCells = centroids.crossJoin(broadcast(query))
      .select(col("cell_id"), dot(col("c_vec"), col(queryVecCol)).as("s"))
      .orderBy(desc("s"), col("cell_id"))
      .limit(nProbe)
      .select("cell_id")
    indexedCorpus
      .join(broadcast(probeCells), Seq("cell_id"))
      .crossJoin(broadcast(query))
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }
}
