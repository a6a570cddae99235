package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * product; ties → lowest cell_id). Centroids are a small fixed set
    * → broadcast; the argmax is a max_by AGGREGATION, not a window
    * row_number: the window form shuffles all corpus × C scored rows
    * and sorts them, while the partial-aggregated max_by combines the
    * C candidates per vector map-side — the shuffle carries one row
    * per vector regardless of C. Done ONCE at index-build time,
    * amortized over all queries. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol), col("cell_id"),
        dot(col(vecCol), col("c_vec")).as("__score"))
      .groupBy(col(idCol))
      // struct compare is lexicographic: max (__score, -cell_id) =
      // highest score, then LOWEST cell_id — deterministic under ties.
      .agg(max_by(
        struct(col(vecCol), col("cell_id")),
        struct(col("__score"), -col("cell_id"))).as("__best"))
      .select(col(idCol), col(s"__best.$vecCol").as(vecCol),
        col("__best.cell_id").as("cell_id"))

  /** Fixed seeded hyperplane matrix: bands × bitsPerBand rows of `dims`
    * gaussians — deterministic across runs/executors, passed to the
    * fused HyperplaneBandKeys expression as one constant Literal. */
  private def planeMatrix(dims: Int, nPlanes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    typedlit(Seq.fill(nPlanes)(Seq.fill(dims)(rnd.nextGaussian().toFloat)))
  }

  /** Random-hyperplane (SimHash-for-cosine) LSH sketch: bit j of the
    * sketch is the sign of v · r_j for a fixed pseudo-random hyperplane
    * r_j. P[bit differs] = angle(a,b)/π, so Hamming distance estimates
    * cosine distance. Evaluated by the fused native HyperplaneBandKeys
    * expression (expressions/VectorExpressions.scala) — one JIT-friendly
    * loop per row, not `bits` separate dot-product trees.
    *
    * Packs into one Long, so bits <= 63; for LSH banding (where total
    * bits = bands × bitsPerBand wants to exceed 64) use
    * `cosineBandKeys`. This form is for whole-sketch Hamming math
    * (`bit_count(xor)`). Requires graft_band_keys registered
    * (VectorExpressions.register / GraftExtensions). */
  def cosineSketch(vec: Column, dims: Int, bits: Int, seed: Long = 42L): Column = {
    require(bits <= 63, "cosineSketch packs into one Long; use cosineBandKeys for wider sketches")
    element_at(
      call_function("graft_band_keys", vec, planeMatrix(dims, bits, seed), lit(bits)),
      1)
  }

  /** Banded hyperplane sketch for LSH bucketing: `bands` keys, each
    * packing `bitsPerBand` sign bits from its own hyperplanes (total
    * planes = bands × bitsPerBand — not limited to 64). Two vectors are
    * LSH candidates iff some band position holds an equal key. Returns
    * array<long> indexed by band — pair with `posexplode` so the join
    * key is (band position, key).
    *
    * Shuffle discipline requires WIDE bands: uncorrelated vectors agree
    * on one sign bit with p = 1/2, so a band of r bits collides with
    * p = 2^-r and the expected all-pairs candidate fraction is
    * ≤ bands · 2^-r. With r < 8 that fraction is large enough that the
    * band self-join degenerates toward quadratic brute force —
    * require()d away. (r = 8, bands = 16 ⇒ ≤ 6.3% of pairs; recall at
    * cosine 0.9 is 1-(1-p_bit^8)^16 ≈ 0.998 with p_bit = 1-acos(.9)/π.) */
  def cosineBandKeys(vec: Column, dims: Int, bands: Int, bitsPerBand: Int,
                     seed: Long = 42L): Column = {
    require(bitsPerBand >= 8,
      s"bitsPerBand=$bitsPerBand: bands narrower than 8 bits collide on " +
        "2^-bitsPerBand of ALL pairs — the self-join degenerates toward quadratic")
    require(bitsPerBand <= 63, "band key packs into one Long")
    call_function("graft_band_keys", vec,
      planeMatrix(dims, bands * bitsPerBand, seed), lit(bitsPerBand))
  }

  /** Embedding near-duplicate pairs via the banded cosine sketch — the
    * scale path q48's bounded brute-force baseline points at.
    *
    * Two vectors become a candidate iff a full band of hyperplane sign
    * bits matches (the Hamming analog of MinHash banding —
    * near-identical vectors flip few sketch bits, so some band survives
    * intact). Candidates are then rescored with EXACT cosine and
    * thresholded, so banding affects recall only, never precision.
    *
    * Shuffle discipline: the band self-join carries (band, key, id) —
    * never the vectors; vectors are fetched by two id-equi-joins only
    * for the (sub-quadratic, see cosineBandKeys) candidate set.
    * Deterministic: seeded hyperplanes, no rand(). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         dims: Int, bands: Int, bitsPerBand: Int,
                         threshold: Double, seed: Long = 42L): DataFrame = {
    val banded = df.select(col(idCol).as("id"),
      posexplode(cosineBandKeys(col(vecCol), dims, bands, bitsPerBand, seed))
        .as(Seq("band", "key")))
    val cand = banded.select(col("band"), col("key"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("key"), col("id").as("id_b")),
        Seq("band", "key"))
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

  /** Lloyd/k-means centroid update — the other half of IVF index
    * building (assignCells is the assignment step; alternate the two
    * to refine centroids at scale instead of hand-picking them):
    * element-wise mean of each cell's member vectors.
    *
    * Shuffle shape: posexplode to (cell, pos, x) then partial+final
    * avg — map-side combine reduces each partition to cells × dims
    * rows regardless of corpus size, and the collect_list that
    * re-packs the means is bounded by dims per cell. Deterministic:
    * means are order-insensitive up to float rounding, and the repack
    * sorts by position. */
  def updateCentroids(indexed: DataFrame, vecCol: String): DataFrame =
    indexed
      .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("cell_id"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      // cast back to float: centroids must stay array<float> so the
      // assignCells/updateCentroids alternation keeps hitting the
      // native DotProductF32 path (its rewrite guards on float arrays)
      // and refined centroids remain valid graft_* function inputs.
      .select(col("cell_id"),
        transform(col("pm"), p => p.getField("m").cast("float")).as("c_vec"))

  /** Persist the IVF index as a CELL-PARTITIONED parquet layout — the
    * storage half of the IVF story (assignCells computes the
    * assignment; this writes it so queries stop recomputing it): one
    * directory per cell_id, so a probe that touches nProbe cells lists
    * and reads ONLY those directories. The 100 TB ANN read path is
    * exactly this — the index is big (it IS the corpus + assignment),
    * the probe is small, and partition pruning is what connects them. */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, path: String): Unit =
    graft.pipeline.Warehouse.writePartitioned(
      assignCells(corpus, idCol, vecCol, centroids), path, "cell_id")

  /** ANN top-k over the PERSISTED index: rank the C centroids against
    * the query (fixed-size computation), collect the nProbe winning
    * cell ids — a driver hop bounded by nProbe longs, the same bounded
    * hop the bloom sketch pays, and what turns the probe into a
    * LITERAL IN predicate on the partition column — then scan only the
    * probed cell directories (PlanShapeSpec pins the PartitionFilters)
    * and rescore exactly. Same arithmetic as ivfTopK, so the same
    * DuckDB oracle gates it end-to-end. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       idCol: String, vecCol: String, centroids: DataFrame,
                       query: DataFrame, queryVecCol: String,
                       k: Int, nProbe: Int): DataFrame = {
    val probeCells = centroids.crossJoin(broadcast(query))
      .select(col("cell_id"), dot(col("c_vec"), col(queryVecCol)).as("s"))
      .orderBy(desc("s"), col("cell_id"))
      .limit(nProbe)
      .select("cell_id")
      .collect().map(_.getLong(0))
    spark.read.parquet(path)
      .filter(col("cell_id").isin(probeCells: _*))
      .crossJoin(broadcast(query))
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Multi-iteration Lloyd k-means build (VERDICT r9 #6): alternate
    * assignCells / updateCentroids for a FIXED number of iterations
    * from the given seed centroids — deterministic (no random init, no
    * convergence-epsilon float race), which is what makes the whole
    * build oracle-able (q121 replays it as unrolled SQL CTEs).
    *
    * Per iteration the corpus is scanned once, scored against the
    * broadcast centroids, and reduced map-side to one row per vector
    * (assignCells) then to cells × dims scalars (updateCentroids) —
    * the corpus never shuffles; only the C × dims centroid frame moves
    * between iterations. The unrolled declarative plan embeds `iters`
    * corpus passes in one DAG, which is Lloyd's inherent cost; cells
    * that lose all members drop out (standard empty-cell behavior —
    * the refined centroid set may shrink). */
  def kmeansBuild(corpus: DataFrame, idCol: String, vecCol: String,
                  seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one Lloyd iteration")
    var centroids = seeds
    for (_ <- 1 to iters)
      centroids = updateCentroids(assignCells(corpus, idCol, vecCol, centroids), vecCol)
    centroids
  }

  /** Quantized two-pass ANN — the production use of ops.Quantize: the
    * first pass scores the WHOLE corpus with int8-quantized vectors
    * (when the store is written quantized, the scan reads 4× fewer
    * bytes and the dot is integer math), a TakeOrdered shortlist of
    * `shortlist` candidates survives, and only those are rescored with
    * the exact float dot. Recall loss is bounded by the quantization
    * error (|approx − exact| ≤ per-element scale/2 effects); a
    * shortlist a few × k recovers exact top-k in practice — and the
    * whole pipeline is deterministic (q92 hash-matches a DuckDB oracle
    * reproducing the identical arithmetic).
    *
    * Approximate score = int_dot(qa, qb) · scale_a · scale_b ≈ a·b,
    * accumulated exactly (|int dot| ≤ dims · 127² ≪ 2⁵³). */
  def quantizedTopK(corpus: DataFrame, idCol: String, vecCol: String,
                    query: DataFrame, queryVecCol: String,
                    k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val qc = corpus
      .select(col(idCol), col(vecCol),
        Quantize.int8Scale(col(vecCol)).as("__scale"))
      .select(col(idCol), col(vecCol), col("__scale"),
        Quantize.quantizeInt8(col(vecCol), col("__scale")).as("__qv"))
    val qq = query
      .select(col(queryVecCol),
        Quantize.int8Scale(col(queryVecCol)).as("__qscale"))
      .select(col(queryVecCol), col("__qscale"),
        Quantize.quantizeInt8(col(queryVecCol), col("__qscale")).as("__qqv"))
    qc.crossJoin(broadcast(qq))
      .select(col(idCol), col(vecCol), col(queryVecCol),
        (aggregate(
            zip_with(col("__qv"), col("__qqv"), (a, b) => (a * b).cast("long")),
            lit(0L), (acc, x) => acc + x)
          .cast("double") * col("__scale") * col("__qscale")).as("__approx"))
      .orderBy(desc("__approx"), col(idCol))
      .limit(shortlist)
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** SEMANTIC dedup (SemDeDup-style, Abbas et al. 2023): cluster the
    * corpus by nearest centroid, then within each cluster drop every
    * vector whose cosine similarity to a LOWER-id cluster member
    * reaches `threshold` — semantic near-duplicates (same content,
    * different surface form) that token-level MinHash/SimHash never
    * pair. Keep policy is the same one-pass greedy keep-lowest-id as
    * token near-dedup (Dedup.nearDedupFromPairs): drop b iff some a<b
    * in b's cluster has cos(a,b) ≥ threshold, regardless of whether a
    * itself survives.
    *
    * Returns the keep-set (id, cell_id), deterministic end to end:
    * assignment ties break to the lowest cell (assignCells), cosine is
    * double-accumulated, and the drop rule depends only on ids —
    * which is what makes the full pipeline DuckDB-oracle-checkable
    * (q109), unlike the seeded-LSH candidate paths.
    *
    * Scale shape: this is exactly SemDeDup's design point — the
    * pairwise comparison is quadratic ONLY within a cluster, and the
    * cluster count grows with the corpus (k ∝ n keeps expected cluster
    * size constant, amortized by the one-shuffle assignCells pass).
    * Vectors shuffle once, keyed by cell; the pair join is
    * cell-co-partitioned. A skewed cell quadratic-blows one task —
    * production caps cell population (re-split oversized cells with a
    * secondary k-means round) before pairing. This composition
    * references the assignment three times (both pair sides + the
    * keep output), which Catalyst re-executes per branch; at scale,
    * WRITE the assignCells output once first — it is the same
    * clustered layout the IVF index (q80) stores, so the dedup pass
    * reads the index rather than re-assigning. */
  def semanticDedupKeep(corpus: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, threshold: Double): DataFrame = {
    val assigned = assignCells(corpus, idCol, vecCol, centroids)
    val a = assigned.select(col("cell_id"), col(idCol).as("__id_a"),
      col(vecCol).as("__va"))
    val b = assigned.select(col("cell_id"), col(idCol).as("__id_b"),
      col(vecCol).as("__vb"))
    val drops = a.join(b, Seq("cell_id"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
    assigned.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell_id"))
  }

  /** HARD-NEGATIVE MINING for embedding/reranker training (Karpukhin
    * et al. 2020 "Dense Passage Retrieval" §4.2 — hard negatives from
    * the retriever's own index beat random negatives; Xiong et al.
    * 2021 ANCE makes the ANN index the negative sampler): for every
    * anchor vector, the `k` most-similar CELL-MATES whose similarity
    * stays BELOW `posThreshold` — close enough to confuse the model
    * (that is what makes them hard), but below the near-duplicate /
    * positive band that q109's semantic dedup would merge (a
    * near-copy labeled "negative" would poison the contrastive loss).
    *
    * Relationship to siblings (distinct concepts, same family): q183
    * draws its negatives from a content-addressed RING — uniformly
    * random pairing, the easy-negative baseline; this op draws them
    * from the IVF candidate structure — similarity-RANKED, the
    * hard-negative refinement. q109 uses the same cell self-join to
    * DROP the ≥-threshold band; this op mines the band just under it.
    *
    * Plan shape (the 100 TB design): candidates come ONLY from the
    * anchor's own IVF cell — the pair join is cell-co-partitioned and
    * costs Σ|cell|², never n² (the q109/q71 bound); the per-anchor
    * top-k is a window over cell-mate rows (≤ |cell| per anchor). At
    * scale the cells are trained k-means centroids (q121) and a
    * production run re-splits oversized cells before pairing — the
    * same skew cap semanticDedupKeep documents. Ranking is on the RAW
    * double dot (deterministic fold order both engines), ties broken
    * by neg_id; the reported sim rounds once at 4dp on output (the
    * q71 convention).
    *
    * Input is an ALREADY-ASSIGNED frame (idCol, vecCol, cell_id) —
    * assignCells/the persisted IVF index output — so the assignment
    * pass is paid once and shared, not re-derived per consumer.
    *
    * Output: (anchor_id, neg_id, rank, sim), rank 1..≤k per anchor;
    * anchors whose cell offers no sub-threshold mate emit no rows
    * (the honest result — production widens to nProbe cells before
    * relaxing the threshold). */
  def hardNegatives(indexed: DataFrame, idCol: String, vecCol: String,
                    k: Int, posThreshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = indexed.select(col("cell_id"), col(idCol).as("anchor_id"),
      col(vecCol).as("__av"))
    val b = indexed.select(col("cell_id"), col(idCol).as("neg_id"),
      col(vecCol).as("__bv"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(desc("__sim"), col("neg_id"))
    a.join(b, Seq("cell_id"))
      .filter(col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), col("neg_id"),
        dot(col("__av"), col("__bv")).as("__sim"))
      .filter(col("__sim") < posThreshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("neg_id"), col("rank"),
        round(col("__sim"), 4).as("sim"))
  }

  /** PRODUCT-QUANTIZATION codebook training (Jégou et al. 2011, TPAMI
    * "Product quantization for nearest neighbor search"): split the
    * `dims`-dim space into `m` contiguous subspaces of dims/m and run
    * the SAME deterministic Lloyd build (kmeansBuild — q121's gated
    * kernel) independently in each, seeded by the sub-slices of the
    * caller's seed vectors. Returns (sub, cell_id, c_vec) — m small
    * codebooks, m × ksub × (dims/m) floats total, broadcastable at any
    * corpus scale.
    *
    * Metric note: assignment here is MAX DOT (assignCells), consistent
    * with the inner-product scoring pqTopK does — MIPS-flavored PQ.
    * Classical PQ assigns by L2 argmin; the two coincide on normalized
    * sub-vectors. One convention end-to-end keeps the whole lifecycle
    * DuckDB-replayable. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              seeds: DataFrame, m: Int, dims: Int, iters: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sub = dims / m
    (0 until m).map { j =>
      val subCorpus = corpus.select(col(idCol),
        slice(col(vecCol), j * sub + 1, sub).as(vecCol))
      val subSeeds = seeds.select(col("cell_id"),
        slice(col("c_vec"), j * sub + 1, sub).as("c_vec"))
      kmeansBuild(subCorpus, idCol, vecCol, subSeeds, iters)
        .select(lit(j).as("sub"), col("cell_id"), col("c_vec"))
    }.reduce(_ unionByName _)
  }

  /** PQ encode: each vector → m single-byte-range codes (its nearest
    * codeword per subspace). ONE corpus scan: the m×ksub codebook
    * broadcast fans each row out to every (sub, cell) candidate, the
    * sub-slice dot scores it, and a map-side-combined max_by keeps the
    * argmax per (vector, sub) — the shuffle carries m rows per vector
    * (the codes — 1 byte each when stored), never the vectors. Ties
    * break to the lowest cell_id (assignCells' rule). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, m: Int, dims: Int): DataFrame = {
    val sub = dims / m
    corpus.crossJoin(broadcast(codebooks))
      .select(col(idCol), col("sub"), col("cell_id"),
        dot(slice(col(vecCol), col("sub") * sub + 1, lit(sub)),
          col("c_vec")).as("__s"))
      .groupBy(col(idCol), col("sub"))
      .agg(max_by(col("cell_id"), struct(col("__s"), -col("cell_id"))).as("code"))
  }

  /** PQ ANN with ASYMMETRIC DISTANCE COMPUTATION + exact rescore (the
    * q92 two-pass discipline): build the m×ksub lookup table lut[sub,
    * code] = query_sub · codeword once per query (a fixed-size frame),
    * approximate every corpus vector's inner product as Σ_sub
    * lut[sub, code_sub] by joining its m codes against the broadcast
    * LUT — the scan-phase row is m CODES, not dims floats: the 4-byte
    * (m=4) representation is the whole point at 100 TB, where the
    * first pass reads ~dims/m× fewer bytes than even the int8 path —
    * then rescore only the `shortlist` survivors with the exact float
    * dot.
    *
    * Determinism: each LUT entry is quantized to DECIMAL(18,12) before
    * the m-way sum (order-invariant accumulation — comparator-parity
    * rule 8; a raw double sum would make the shortlist boundary
    * partition-order dependent), and both rank steps tie-break on id.
    * Fully DuckDB-replayable, codebooks included (q293). */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, query: DataFrame, queryVecCol: String,
             m: Int, dims: Int, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val sub = dims / m
    val codes = pqEncode(corpus, idCol, vecCol, codebooks, m, dims)
    val lut = codebooks.crossJoin(broadcast(query))
      .select(col("sub"), col("cell_id").as("code"),
        dot(col("c_vec"), slice(col(queryVecCol), col("sub") * sub + 1, lit(sub)))
          .cast("decimal(18,12)").as("__lscore"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col(idCol))
      .agg(sum(col("__lscore")).as("__approx"))
      .orderBy(desc("__approx"), col(idCol))
      .limit(shortlist)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .crossJoin(broadcast(query))
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ ANN (Jégou et al. 2011 §V — the FAISS production layout):
    * coarse-quantize to `coarse`'s cells (max-dot, the house MIPS
    * convention), PQ-encode the RESIDUALS x − c(x) with codebooks
    * trained by the same deterministic Lloyd (seeds = the residuals of
    * ids in [seedLo, seedHi)), prune to the `nProbe` best cells for
    * the query, ADC-score survivors as q·c + Σ_sub lut[sub, code]
    * (every term DECIMAL-quantized before the sum — order-invariant
    * shortlist boundary), and exact-rescore the shortlist.
    *
    * The 100 TB read path in one operator: the probe prunes cells
    * (pair with writeIvfIndex's partition layout), the scan phase
    * reads m-byte codes, and only `shortlist` full vectors are ever
    * fetched. Fully deterministic — q301 hash-matches the generated
    * DuckDB replay of the entire lifecycle. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                coarse: DataFrame, seedLo: Long, seedHi: Long,
                query: DataFrame, queryVecCol: String,
                m: Int, dims: Int, iters: Int,
                nProbe: Int, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val sub = dims / m
    val assigned = assignCells(corpus, idCol, vecCol, coarse)
    val withRes = assigned.join(broadcast(coarse), Seq("cell_id"))
      .select(col(idCol), col("cell_id"),
        zip_with(col(vecCol), col("c_vec"),
          (x, c) => x.cast("double") - c.cast("double")).as("__resid"))
    val seeds = withRes.filter(col(idCol) >= seedLo && col(idCol) < seedHi)
      .select((col(idCol) - seedLo).as("cell_id"), col("__resid").as("c_vec"))
    val cb = pqTrain(withRes.select(col(idCol), col("__resid")),
      idCol, "__resid", seeds, m, dims, iters)
    val probe = coarse.crossJoin(broadcast(query))
      .select(col("cell_id"), dot(col("c_vec"), col(queryVecCol)).as("__s"))
      .orderBy(desc("__s"), col("cell_id")).limit(nProbe).select("cell_id")
    val probed = withRes.join(broadcast(probe), Seq("cell_id"))
    val codes = pqEncode(probed.select(col(idCol), col("__resid")),
      idCol, "__resid", cb, m, dims)
    val lut = cb.crossJoin(broadcast(query))
      .select(col("sub"), col("cell_id").as("code"),
        dot(col("c_vec"), slice(col(queryVecCol), col("sub") * sub + 1, lit(sub)))
          .cast("decimal(18,12)").as("__lscore"))
    val qc = coarse.crossJoin(broadcast(query))
      .select(col("cell_id"),
        dot(col("c_vec"), col(queryVecCol)).cast("decimal(18,12)").as("__qc"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col(idCol)).agg(sum(col("__lscore")).as("__rsum"))
      .join(probed.select(col(idCol), col("cell_id")), Seq(idCol))
      .join(broadcast(qc), Seq("cell_id"))
      .select(col(idCol), (col("__rsum") + col("__qc")).as("__approx"))
      .orderBy(desc("__approx"), col(idCol)).limit(shortlist)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .crossJoin(broadcast(query))
      .select(col(idCol), dot(col(vecCol), col(queryVecCol)).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
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
