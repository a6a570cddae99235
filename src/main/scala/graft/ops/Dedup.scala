package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY.md §2B "LLM-data-pipeline extensions"): exact content-hash
  * dedup and MinHash-LSH near-dup detection.
  *
  * Scale design (the 100 TB rationale for each choice):
  *  - exact dedup shuffles a 32-byte content hash as the key, never raw
  *    document text — the shuffle payload is the row, but the hash
  *    partitioner key is fixed-size regardless of document length.
  *  - near-dup candidate generation is BANDED LSH: a self-join within
  *    band-hash buckets only. All-pairs comparison is O(n²) and dead at
  *    any scale; banding keeps it O(n·bands + candidate pairs).
  *  - signatures use the built-in `xxhash64` (codegen'd Catalyst
  *    expression) — no UDF anywhere, the whole signature pipeline stays
  *    inside WholeStageCodegen.
  */
object Dedup {

  /** 256-bit content hash (hex string). Dedup on this instead of raw
    * text so group keys are fixed-size at any document length. */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Exact dedup, canonical-winner semantics: for each distinct text
    * keep the row with the minimal `keyCol`. One shuffle, keyed on the
    * fixed-size content hash; deterministic under ties by construction
    * (row_number over a total order). */
  def exactDedup(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col("__content_hash")).orderBy(col(keyCol))
    df.withColumn("__content_hash", contentHash(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__content_hash", "__rn")
  }

  /** Dedup group stats: one row per distinct content with the winning
    * key and the duplicate count. Partial+final hash agg — the shuffle
    * carries (hash, min-key, count) not documents. */
  def dedupGroups(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(keyCol)).as(keyCol), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of a token array. Documents shorter
    * than n shingle to the empty set (guarded: `sequence` would flip to
    * a negative step otherwise). */
  def shingles(tokens: Column, n: Int): Column = {
    val starts = sequence(lit(0), size(tokens) - n)
    val grams = transform(starts, i =>
      concat_ws(" ", (1 to n).map(j => element_at(tokens, i + lit(j))): _*))
    when(size(tokens) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature as a single Column: k independent hash functions
    * simulated as xxhash64(shingle, seed_i); signature element i is the
    * min over all shingles.
    *
    * ONLY for tiny inputs/tests: `shingleCol`'s whole expression tree is
    * re-evaluated inside every one of the k outer-lambda iterations (no
    * cross-iteration CSE in higher-order functions), so a non-trivial
    * shingle expression costs k× per row. The corpus-scale path is
    * `minhashSignatures` below — measured 70× faster at sf0.1. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleCol, sh => xxhash64(sh, i))))

  /** Corpus-scale MinHash: explode shingles to rows, hash each shingle
    * ONCE per seed, then a k-way min aggregation per document. The
    * shuffle carries k longs per (partition, doc) thanks to map-side
    * partial mins; shingle strings are hashed exactly k times each
    * (inherent to MinHash) instead of k× re-building the whole shingle
    * array per row as the Column form does.
    *
    * Documents with no shingles (fewer than n tokens) have no rows
    * here, hence NO signature and no candidates — the explicit fix for
    * the degenerate all-null-signature bucket that would otherwise
    * pair every short document with every other. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(split(col(textCol), " "), shingleN)).as("sh"))
    val hashed = sh.select(col("id"),
      transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(col("sh"), i)).as("h"))
    val mins = (0 until numHashes).map(i => min(element_at(col("h"), i + 1)).as(s"m$i"))
    hashed.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys: the signature split into `bands` slices of
    * `rowsPerBand`, each hashed; a pair of documents lands in the same
    * bucket iff a full band matches. Band index is part of the key so
    * buckets never mix across bands. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * positions. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), m => m))
      .cast("double") / k

  /** Exact Jaccard over two DISTINCT element arrays (test oracle for
    * the minhash estimate; O(|a|·|b|) per pair — never run all-pairs at
    * scale, only on LSH candidates). */
  def exactJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Banded MinHash-LSH near-duplicate candidate pairs.
    *
    * shingle → signature → explode band keys → self-join per bucket →
    * estimate Jaccard from signatures. The join key is (band, bucket),
    * so comparisons happen only inside buckets (sub-quadratic); the
    * same pair colliding in several bands is collapsed by
    * dropDuplicates on the pair key.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * Skew note for 100 TB: a degenerate bucket (e.g. the empty-shingle
    * signature) would quadratic-blow a single task; AQE skew-join
    * splitting handles moderate skew, and boilerplate-document buckets
    * should be filtered by a bucket-size cap upstream in a real corpus. */
  /** End-to-end near-dedup: keep only documents that are not the
    * HIGHER-id member of any candidate pair at or above `threshold`.
    * Greedy keep-lowest-id semantics: for a chain a~b, b~c the kept set
    * is {a} even if a≁c — the standard one-pass approximation (exact
    * canonical-per-component dedup needs iterative connected
    * components; at 100 TB the greedy pass is what production corpus
    * dedup ships). */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                threshold: Double, shingleN: Int = 3, numHashes: Int = 64,
                bands: Int = 16): DataFrame = {
    val losers = lshCandidatePairs(df, idCol, textCol, shingleN, numHashes, bands)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
      .select(col("id"), col("sig"), explode(bandKeys(col("sig"), bands, r)).as("bk"))
    val a = sigs.select(col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
  }
}
