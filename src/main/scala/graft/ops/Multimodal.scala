package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2B): media payloads as opaque
  * binary columns with typed metadata, plus the documents ⋈ embeddings
  * nested-row assembly.
  *
  * Decoding: `decodePpm` is a REAL image decoder (binary PPM needs no
  * codec library — pure byte arithmetic). Codec-dependent formats
  * (JPEG/audio/video) are NOT decodable in this container, so that
  * seam (`extractFeatures`) stays a clearly-marked deterministic STUB
  * — everything Spark-side (schema, join/partition shape,
  * mapPartitions batching, encoder plumbing) is real and tested, and
  * a real codec drops in without touching any plan shape, exactly as
  * `decodePpm` demonstrates.
  *
  * Scale design: binary payloads never enter a shuffle here — feature
  * extraction is mapPartitions (narrow), and the multimodal assembly
  * join shuffles on the long id, carrying each payload exactly once.
  * At 100 TB the payload column would live in its own parquet column
  * chunk (columnar pruning means id-only queries never read bytes).
  */
object Multimodal {

  /** One nested multimodal row per document: text + typed metadata +
    * embedding vector. The struct nesting is the point — downstream
    * consumers address `doc.meta.lang`, `vec.embedding` etc. */
  def assemble(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(
        docs("doc_id"),
        struct(
          docs("text"),
          struct(docs("lang"), docs("source"), docs("n_chars")).as("meta")).as("doc"),
        struct(emb("embedding"), emb("label")).as("vec"))

  /** Attach an opaque binary payload column + typed media metadata.
    * The fixture corpus has no real media, so the payload is the UTF-8
    * encoding of the text — the SCHEMA (binary + metadata struct) is
    * what production code consumes. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("media_meta"))

  /** Typed per-media features produced by the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           width: Int, height: Int)

  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  private implicit val rowEnc: Encoder[(Long, Array[Byte])] =
    Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)

  /** STUB decoder: a real implementation would decode image bytes and
    * emit width/height/features; this container has no media libs, so
    * dimensions are DERIVED DETERMINISTICALLY from a payload checksum
    * (clearly fake, stable across runs). The mapPartitions shape is the
    * real contract: batched, narrow (no shuffle), binary-in /
    * struct-out. */
  def extractFeatures(payloadDf: DataFrame): Dataset[MediaFeatures] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          var h = 1125899906842597L // FNV-style seed; deterministic
          var i = 0
          while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
          MediaFeatures(
            doc_id = id,
            n_bytes = bytes.length,
            checksum = h,
            width = 64 + (((h % 1024) + 1024) % 1024).toInt,
            height = 64 + ((((h >>> 10) % 1024) + 1024) % 1024).toInt)
        }
      }

  /** Deterministic synthetic P6 payload for `doc_id` — the planted
    * fixture that puts `decodePpm` under the driver's hash gate (q94).
    * Every byte is a pure function of the id, mirrored EXACTLY by the
    * q94 DuckDB oracle's arithmetic:
    *
    *  - width  = 4 + id % 5   (4..8)
    *  - height = 3 + id % 4   (3..6)
    *  - raster byte j (0-based, j = 3·pixel + channel):
    *      (id·31 + j) mod 256
    *  - id % 7 == 0  ⇒ the raster is TRUNCATED by one byte — the
    *    planted corrupt payload; decodePpm must quarantine it as
    *    valid = false, never fail the task.
    *  - id % 5 == 0  ⇒ the header carries a `# planted` comment line,
    *    exercising the comment-skip branch of the parser under the
    *    gate (outputs are unaffected — comments are whitespace).
    *
    * So the gated query checks the WHOLE path: if either this
    * generator or the decoder drifts from the documented arithmetic
    * (header scan, comment skip, separator rule, channel sums), the
    * oracle hash mismatches. */
  def syntheticPpm(id: Long): Array[Byte] = {
    // the raster byte formula matches the DuckDB oracle's
    // (id*31 + 3j) % 256 ONLY for non-negative ids: the decoder reads
    // bytes unsigned (& 0xff ⇒ mod-256 in 0..255) while SQL's % can go
    // negative. The documents fixture uses doc_id ≥ 0 everywhere; make
    // that domain assumption explicit instead of silently diverging.
    require(id >= 0, s"syntheticPpm requires a non-negative id, got $id")
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val header =
      if (id % 5 == 0) s"P6\n# planted\n$w $h\n255\n" else s"P6\n$w $h\n255\n"
    val hb = header.getBytes("US-ASCII")
    val full = w * h * 3
    val rasterLen = if (id % 7 == 0) full - 1 else full
    val out = new Array[Byte](hb.length + rasterLen)
    System.arraycopy(hb, 0, out, 0, hb.length)
    var j = 0
    while (j < rasterLen) {
      out(hb.length + j) = ((id * 31 + j) % 256).toByte
      j += 1
    }
    out
  }

  /** Per-image features from a REAL decode of the PPM (P6) format. */
  case class PpmFeatures(doc_id: Long, valid: Boolean, width: Int,
                         height: Int, mean_r: Double, mean_g: Double,
                         mean_b: Double)

  implicit val ppmFeaturesEnc: Encoder[PpmFeatures] = Encoders.product[PpmFeatures]

  /** REAL image decoder — no stub: binary PPM (P6) is codec-free
    * (ASCII header `P6 <w> <h> <maxval>` with optional `#` comments,
    * then w·h·3 raw RGB bytes), so it decodes with pure byte
    * arithmetic. Emits dimensions + per-channel means; malformed or
    * truncated payloads yield a `valid = false` row instead of a task
    * failure (same quarantine philosophy as Ingest: at 100 TB a
    * corrupt image is a countable row, not a dead executor). Narrow
    * mapPartitions, binary never shuffles — the same contract the
    * stubbed codec-format seam (`extractFeatures`) documents. */
  def decodePpm(payloadDf: DataFrame): Dataset[PpmFeatures] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parsePpm(id, bytes) })

  /** P6 header walk shared by every PPM consumer: returns
    * (width, height, raster offset) for a well-formed header whose full
    * raster fits the payload, null otherwise. */
  private[ops] def ppmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    var i = 0
    def skipSpaceAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return null
    i = 2
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    // exactly ONE whitespace byte separates header from raster — a
    // non-whitespace byte here means a malformed header, not a separator
    if (i >= bytes.length ||
        !(bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\r' || bytes(i) == '\n'))
      return null
    i += 1
    if (i + w.toLong * h * 3 > bytes.length) return null
    (w, h, i)
  }

  private[graft] def parsePpm(id: Long, bytes: Array[Byte]): PpmFeatures = {
    val hd = ppmHeader(bytes)
    if (hd == null) return PpmFeatures(id, valid = false, 0, 0, 0.0, 0.0, 0.0)
    val (w, h, off) = hd
    val need = w.toLong * h * 3
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = 0L
    while (p < need) {
      val base = off + p.toInt
      sr += bytes(base) & 0xff
      sg += bytes(base + 1) & 0xff
      sb += bytes(base + 2) & 0xff
      p += 3
    }
    val n = (w.toLong * h).toDouble
    PpmFeatures(id, valid = true, w, h, sr / n, sg / n, sb / n)
  }

  /** Per-image PERCEPTUAL HASH row — the image-dedup key (q298). */
  case class PpmHash(doc_id: Long, valid: Boolean, width: Int,
                     height: Int, phash: Long)

  implicit val ppmHashEnc: Encoder[PpmHash] = Encoders.product[PpmHash]

  /** AVERAGE-HASH (aHash) perceptual fingerprint on the REAL PPM
    * decode, at NATIVE resolution: pixel p's bit is set iff its gray
    * level (r+g+b — no division, exact integers) exceeds the image
    * mean, compared cross-multiplied (n·g_p > Σg) so the whole hash is
    * integer arithmetic with no float anywhere. Images here are ≤ 8×6
    * = 48 pixels, so the bit-per-pixel hash packs into one long; the
    * classic 8×8-resample aHash is this exact kernel composed with
    * `downsamplePpm`'s resize when inputs are larger. Two images with
    * equal (width, height, phash) have the same above-mean brightness
    * PATTERN — the near-duplicate relation tonal shifts don't break,
    * which byte-exact hashing (and text-side MinHash) cannot see.
    * Malformed payloads quarantine as valid = false (the decodePpm
    * contract); narrow mapPartitions, binary never shuffles.
    *
    * HARD BOUND, not an assumption: w·h > 64 quarantines as
    * valid = false. A JVM `1L << p` shift wraps mod 64, so a larger
    * raster would silently alias bit p onto bit p%64 and hand
    * q298-style dedup colliding phashes — oversized images must go
    * through downsamplePpm to ≤ 64 px FIRST (the classic 8×8-resample
    * composition above), never through the raw kernel. */
  def ppmAHash(payloadDf: DataFrame): Dataset[PpmHash] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val hd = ppmHeader(bytes)
        if (hd == null) PpmHash(id, valid = false, 0, 0, 0L)
        else if (hd._1.toLong * hd._2 > 64)
          PpmHash(id, valid = false, hd._1, hd._2, 0L)
        else {
          val (w, h, off) = hd
          PpmHash(id, valid = true, w, h, aHashKernel(bytes, off, w, h))
        }
      })

  /** The aHash bit-pattern kernel shared by ppmAHash and the video
    * frame hasher: gray g(p) = r+g+b, bit p set iff n·g(p) > Σg —
    * all-integer, callers enforce the w·h ≤ 64 bound. */
  private[ops] def aHashKernel(bytes: Array[Byte], off: Int,
                               w: Int, h: Int): Long = {
    val n = w * h
    val g = new Array[Int](n)
    var tot = 0L
    var p = 0
    while (p < n) {
      val base = off + 3 * p
      g(p) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
        (bytes(base + 2) & 0xff)
      tot += g(p)
      p += 1
    }
    var hash = 0L
    p = 0
    while (p < n) {
      if (n.toLong * g(p) > tot) hash |= (1L << p)
      p += 1
    }
    hash
  }

  /** Deterministic synthetic VIDEO container for `doc_id` — the
    * fixture that puts the container parser + frame hasher under the
    * driver's hash gate (q335), the video leg of the q94/q129 planted
    * decoders. Format (custom, codec-free — this container has no
    * video libs, and the point is the PLUMBING: container walk, frame
    * extraction, per-frame hashing, temporal dedup):
    *
    *   "GV1 <nframes>\n" then nframes complete binary P6 images
    *   back to back (same P6 shape decodePpm reads).
    *
    * Frame geometry w = 4 + id % 5, h = 3 + id % 4 (the q94 image
    * dims); nframes = 4 + id % 5 (4..8). Frame f's raster byte j is
    *   (id·31 + (f div 3)·97 + f + j) mod 256
    * — a SCENE change every 3 frames (the ·97 jump re-randomizes the
    * pattern) and a +1 global brightness drift per frame inside a
    * scene (aHash is mean-relative, so drift flips only mod-256
    * wrap pixels: intra-scene hamming ≤ 3 on the fixture, cuts
    * average ~15 — the separation the q335 keyframe rule thresholds).
    * id % 11 == 0 ⇒ the byte stream is TRUNCATED 5 bytes short — the
    * planted corrupt container the parser must quarantine whole. */
  def syntheticVideo(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticVideo requires a non-negative id, got $id")
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val nf = (4 + id % 5).toInt
    val head = s"GV1 $nf\n".getBytes("US-ASCII")
    val fh = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val frameLen = fh.length + w * h * 3
    val full = head.length + nf * frameLen
    val len = if (id % 11 == 0) full - 5 else full
    val out = new Array[Byte](len)
    System.arraycopy(head, 0, out, 0, head.length)
    var pos = head.length
    var f = 0
    while (f < nf && pos < len) {
      var j = 0
      while (j < fh.length && pos < len) { out(pos) = fh(j); j += 1; pos += 1 }
      val scene = f / 3
      j = 0
      while (j < w * h * 3 && pos < len) {
        out(pos) = ((id * 31 + scene * 97 + f + j) % 256).toByte
        j += 1; pos += 1
      }
      f += 1
    }
    out
  }

  /** One row per decoded video frame: the frame's aHash under the
    * ppmAHash kernel. A malformed/truncated container quarantines the
    * WHOLE video as a single (valid = false, frame = -1) row — a
    * half-parsed video must not leak a plausible-looking prefix into
    * keyframe selection. */
  case class VideoFrameHash(doc_id: Long, valid: Boolean, frame: Int,
                            width: Int, height: Int, phash: Long)

  implicit val videoFrameHashEnc: Encoder[VideoFrameHash] =
    Encoders.product[VideoFrameHash]

  /** REAL container walk — no stub: header scan, per-frame P6 decode
    * (the ppmHeader walk on each frame slice), per-frame aHash. Narrow
    * mapPartitions + flatMap, binary never shuffles; the hash rows
    * (16 B/frame) are what reaches the keyframe join. */
  def videoFrameHashes(payloadDf: DataFrame): Dataset[VideoFrameHash] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseVideo(id, bytes) })

  private[graft] def parseVideo(id: Long,
                                bytes: Array[Byte]): Seq[VideoFrameHash] = {
    def bad = Seq(VideoFrameHash(id, valid = false, -1, 0, 0, 0L))
    if (bytes.length < 5 || bytes(0) != 'G' || bytes(1) != 'V' ||
        bytes(2) != '1' || bytes(3) != ' ') return bad
    var i = 4
    var nf = 0
    var any = false
    while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
      nf = nf * 10 + (bytes(i) - '0'); i += 1; any = true
    }
    if (!any || nf <= 0 || i >= bytes.length || bytes(i) != '\n') return bad
    i += 1
    val out = Seq.newBuilder[VideoFrameHash]
    var f = 0
    while (f < nf) {
      val slice = java.util.Arrays.copyOfRange(bytes, i, bytes.length)
      val hd = ppmHeader(slice)
      if (hd == null) return bad
      val (w, h, off) = hd
      if (w.toLong * h > 64) return bad // the ppmAHash shift bound
      out += VideoFrameHash(id, valid = true, f, w, h,
        aHashKernel(slice, off, w, h))
      i += off + w * h * 3
      f += 1
    }
    out.result()
  }

  /** Downsampled-image features (REAL resize math on the REAL decode —
    * the codec-free format is what makes the whole resize path
    * testable, not a stub like the byte-stride `resizePayload`). */
  case class PpmThumb(doc_id: Long, valid: Boolean, out_w: Int, out_h: Int,
                      mean_r: Double, mean_g: Double, mean_b: Double)

  implicit val ppmThumbEnc: Encoder[PpmThumb] = Encoders.product[PpmThumb]

  /** NEAREST-NEIGHBOR DOWNSAMPLE of a P6 raster by an integer factor:
    * output pixel (x, y) = input pixel (factor·x, factor·y), output
    * dims ceil(w/factor) × ceil(h/factor) — the standard training-
    * pipeline thumbnail pass (resize-before-embed), decode and resample
    * fused in ONE pass over the raster with per-channel means from
    * exact integer sums over the SAMPLED pixels only. Malformed or
    * truncated payloads quarantine as valid = false (the Ingest
    * philosophy). Narrow mapPartitions; binary never shuffles; q192
    * hash-matches a DuckDB replay of the same grid arithmetic on the
    * synthetic payloads. */
  def downsamplePpm(payloadDf: DataFrame, factor: Int): Dataset[PpmThumb] = {
    require(factor >= 1, "factor must be positive")
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parsePpmThumb(id, bytes, factor) })
  }

  private[graft] def parsePpmThumb(id: Long, bytes: Array[Byte],
                                 factor: Int): PpmThumb = {
    val hd = ppmHeader(bytes)
    if (hd == null) return PpmThumb(id, valid = false, 0, 0, 0.0, 0.0, 0.0)
    val (w, h, off) = hd
    val ow = (w + factor - 1) / factor
    val oh = (h + factor - 1) / factor
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val base = off + 3 * ((y * factor) * w + x * factor)
        sr += bytes(base) & 0xff
        sg += bytes(base + 1) & 0xff
        sb += bytes(base + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = (ow.toLong * oh).toDouble
    PpmThumb(id, valid = true, ow, oh, sr / n, sg / n, sb / n)
  }

  /** Deterministic synthetic BMP (24bpp uncompressed Windows DIB) for
    * `doc_id` — the second REAL offline-decodable image format (r15,
    * closing the codec-seam carry beside PPM): where P6 is ASCII-header
    * + raw RGB, BMP exercises the parts PPM cannot — LITTLE-ENDIAN
    * multi-byte header fields, BGR channel order, rows PADDED to
    * 4-byte boundaries, and BOTTOM-UP storage (positive biHeight)
    * with the top-down variant (negative biHeight) planted so the
    * row-flip branch is gated. Every byte is a pure function of id,
    * mirrored by q342's oracle:
    *
    *  - w = 4 + id % 5, h = 3 + id % 4 (the q94 dims)
    *  - image-coordinate pixel (x, y), y = 0 the TOP row:
    *    blue  = (id·31 + 5x + 7y)     mod 256
    *    green = (id·31 + 5x + 7y + 1) mod 256
    *    red   = (id·31 + 5x + 7y + 2) mod 256   (stored B,G,R)
    *  - id % 6 == 0 ⇒ TOP-DOWN file (biHeight = −h, rows stored
    *    top-first); otherwise bottom-up. The decoded IMAGE is the
    *    same either way — which is exactly why the gated features
    *    include the row-order-SENSITIVE top_row_gray: channel means
    *    are row-order-invariant and would pass even if the flip were
    *    ignored (the vacuous-branch audit, applied at design time).
    *  - id % 7 == 0 ⇒ raster truncated 1 byte short (quarantine)
    *  - id % 9 == 0 ⇒ biBitCount declared 32 (unsupported ⇒
    *    quarantine; the decoder supports exactly 24bpp BI_RGB). */
  def syntheticBmp(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticBmp requires a non-negative id, got $id")
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val topDown = id % 6 == 0
    val rowSize = ((3 * w + 3) / 4) * 4
    val rasterLen = if (id % 7 == 0) rowSize * h - 1 else rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + rasterLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + rasterLen)            // bfSize
    bb.putInt(0)                         // reserved
    bb.putInt(54)                        // bfOffBits
    bb.putInt(40)                        // biSize
    bb.putInt(w)
    bb.putInt(if (topDown) -h else h)
    bb.putShort(1)                       // biPlanes
    bb.putShort(if (id % 9 == 0) 32 else 24)
    bb.putInt(0)                         // BI_RGB
    bb.putInt(rowSize * h)               // biSizeImage
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // ppm res + palette
    var sy = 0
    var written = 0
    while (sy < h && written < rasterLen) {
      // sy = storage row index; the image row it holds depends on
      // the orientation
      val y = if (topDown) sy else h - 1 - sy
      var b = 0
      while (b < rowSize && written < rasterLen) {
        val v =
          if (b >= 3 * w) 0L // row padding
          else {
            val x = b / 3
            val c = b % 3 // 0=B, 1=G, 2=R
            (id * 31 + 5 * x + 7 * y + c) % 256
          }
        bb.put(v.toByte)
        written += 1
        b += 1
      }
      sy += 1
    }
    bb.array()
  }

  /** Per-image features from the REAL BMP decode: dims, orientation,
    * channel means, and the row-order-sensitive top-row gray sum. */
  case class BmpFeatures(doc_id: Long, valid: Boolean, width: Int,
                         height: Int, top_down: Boolean, mean_r: Double,
                         mean_g: Double, mean_b: Double, top_row_gray: Long)

  implicit val bmpFeaturesEnc: Encoder[BmpFeatures] = Encoders.product[BmpFeatures]

  /** REAL BMP (24bpp BI_RGB) decoder — pure byte arithmetic, no
    * library: file-header walk (magic, pixel-data offset), DIB header
    * (little-endian dims, planes, bit count, compression), padded-row
    * geometry, bottom-up vs top-down row order from biHeight's sign.
    * Anything the decoder does not support (≠24bpp, compressed,
    * short raster, foreign magic) quarantines as valid = false — the
    * decodePpm contract: at 100 TB a corrupt image is a countable
    * row, not a dead executor. Narrow mapPartitions, binary never
    * shuffles. */
  def decodeBmp(payloadDf: DataFrame): Dataset[BmpFeatures] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseBmp(id, bytes) })

  private[graft] def parseBmp(id: Long, bytes: Array[Byte]): BmpFeatures = {
    def bad = BmpFeatures(id, valid = false, 0, 0, top_down = false,
      0.0, 0.0, 0.0, 0L)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad
    val dataOff = i32(10)
    val infoSize = i32(14)
    val w = i32(18)
    val rawH = i32(22)
    if (infoSize < 40 || w <= 0 || rawH == 0) return bad
    // Hostile-header ceiling: without it, rowSize*h overflows Long
    // for w,h near 2^31 and the bounds check below passes spuriously
    // (then pixel offsets truncate). 65536² = 4-gigapixel is already
    // far beyond any payload this table carries; reject, don't throw.
    if (w > 65536 || rawH < -65536 || rawH > 65536) return bad
    val h = math.abs(rawH)
    val topDown = rawH < 0
    if (u16(26) != 1 || u16(28) != 24 || i32(30) != 0) return bad
    val rowSize = ((3L * w + 3) / 4) * 4
    if (dataOff < 54 || dataOff + rowSize * h > bytes.length) return bad
    var (sr, sg, sb) = (0L, 0L, 0L)
    var topRowGray = 0L
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      val rowOff = dataOff + storedRow * rowSize
      var x = 0
      while (x < w) {
        val p = (rowOff + 3 * x).toInt
        val bl = bytes(p) & 0xff
        val gr = bytes(p + 1) & 0xff
        val rd = bytes(p + 2) & 0xff
        sb += bl; sg += gr; sr += rd
        if (y == 0) topRowGray += bl + gr + rd
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    BmpFeatures(id, valid = true, w, h, topDown,
      sr / n, sg / n, sb / n, topRowGray)
  }

  /** Deterministic synthetic WAV (RIFF/PCM16 mono) payload for
    * `doc_id` — the audio analog of `syntheticPpm`: PCM WAV needs no
    * codec library (RIFF chunk walk + little-endian int16 reads), so
    * the audio decode seam can be REAL, not stubbed. Every byte is a
    * pure function of the id, mirrored exactly by q129's oracle:
    *
    *  - sample_rate = 8000 + (id % 4)·4000   (8/12/16/20 kHz)
    *  - n_samples   = 50 + id % 32
    *  - sample k (int16) = (id·7 + k·13) mod 2001 − 1000   (±1000)
    *  - id % 7 == 0 ⇒ the data chunk is TRUNCATED by one byte — the
    *    planted corrupt payload; decodeWav must quarantine it as
    *    valid = false, never fail the task. */
  def syntheticWav(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWav requires a non-negative id, got $id")
    val sampleRate = (8000 + (id % 4) * 4000).toInt
    val n = (50 + id % 32).toInt
    val dataLen = if (id % 7 == 0) n * 2 - 1 else n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      val s = ((id * 7 + k * 13) % 2001 - 1000).toShort
      if (44 + k * 2 + 1 < bb.capacity) bb.putShort(s)
      else bb.put((s & 0xff).toByte) // truncated final sample (corrupt)
      k += 1
    }
    bb.array()
  }

  /** Per-clip features from a REAL decode of RIFF/PCM16 WAV. */
  case class WavFeatures(doc_id: Long, valid: Boolean, sample_rate: Int,
                         n_samples: Long, mean: Double, rms: Double)

  implicit val wavFeaturesEnc: Encoder[WavFeatures] = Encoders.product[WavFeatures]

  /** REAL audio decoder — no stub: RIFF/PCM16 needs only a chunk walk
    * and little-endian int16 reads. Requires PCM (format 1), mono,
    * 16-bit; anything else — or a data chunk that overruns the
    * payload — quarantines as valid = false (the Ingest philosophy: a
    * corrupt clip is a countable row, not a dead executor). Emits
    * sample count, mean, and RMS; sums accumulate in exact longs so
    * the double math is engine-portable (q129 hash-matches the DuckDB
    * replay). Narrow mapPartitions; binary never shuffles. */
  def decodeWav(payloadDf: DataFrame): Dataset[WavFeatures] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseWav(id, bytes) })

  /** RIFF/PCM16-mono chunk walk shared by every WAV consumer: returns
    * (sampleRate, data offset, sample count) for a well-formed payload,
    * null for anything to quarantine (non-PCM, non-mono, truncated or
    * size-overrunning chunks, odd data length). */
  private[graft] def wavPcmData(bytes: Array[Byte]): (Int, Int, Int) = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= bytes.length &&
        s.indices.forall(j => bytes(off + j) == s.charAt(j))
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return null
    var off = 12
    var fmtOk = false
    var sampleRate = 0
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val size = u32(off + 4)
      // a declared size beyond the payload is malformed, and would
      // wrap the offset into a scan loop — quarantine, don't spin
      if (size < 0 || size > bytes.length) return null
      if (ascii(off, "fmt ") && off + 8 + 16 <= bytes.length) {
        fmtOk = u16(off + 8) == 1 && u16(off + 10) == 1 && u16(off + 22) == 16
        sampleRate = u32(off + 12).toInt
      } else if (ascii(off, "data")) {
        dataOff = off + 8
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0 ||
        dataOff + dataLen > bytes.length || dataLen == 0) return null
    (sampleRate, dataOff, (dataLen / 2).toInt)
  }

  /** Little-endian int16 sample k of a located data chunk. */
  @inline private[graft] def pcmSample(bytes: Array[Byte], dataOff: Int,
                                       k: Int): Int =
    (((bytes(dataOff + 2 * k) & 0xff) |
      ((bytes(dataOff + 2 * k + 1) & 0xff) << 8)).toShort).toInt

  private[graft] def parseWav(id: Long, bytes: Array[Byte]): WavFeatures = {
    val pcm = wavPcmData(bytes)
    if (pcm == null) return WavFeatures(id, valid = false, 0, 0L, 0.0, 0.0)
    val (sampleRate, dataOff, n) = pcm
    var (sum, sumSq) = (0L, 0L)
    var k = 0
    while (k < n) {
      val s = pcmSample(bytes, dataOff, k)
      sum += s; sumSq += s.toLong * s
      k += 1
    }
    WavFeatures(id, valid = true, sampleRate, n.toLong,
      sum.toDouble / n, math.sqrt(sumSq.toDouble / n))
  }

  /** Per-clip frame-energy features — the audio analog of the image
    * thumbnail: silence detection / voice-activity triage over FIXED
    * frames (the standard pre-ASR segmentation pass). */
  case class WavFrames(doc_id: Long, valid: Boolean, n_frames: Long,
                       n_silent: Long, max_rms: Double)

  implicit val wavFramesEnc: Encoder[WavFrames] = Encoders.product[WavFrames]

  /** FRAME ENERGY over non-overlapping `frameSize`-sample frames of the
    * REAL PCM decode: per frame, RMS from an exact integer Σs² —
    * quantized to 6dp BEFORE the per-clip aggregates (count of silent
    * frames below `silenceRms`, max RMS), so count/max are order-free
    * and the whole pass is engine-replayable (q193 hash-matches a
    * DuckDB replay of the same frame grid on the synthetic payloads).
    * An incomplete tail frame is dropped (documented — a partial
    * window's RMS is not comparable). Corrupt payloads quarantine as
    * valid = false. Narrow mapPartitions; binary never shuffles. */
  def audioFrameEnergy(payloadDf: DataFrame, frameSize: Int,
                       silenceRms: Double): Dataset[WavFrames] = {
    require(frameSize >= 1, "frameSize must be positive")
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWavFrames(id, bytes, frameSize, silenceRms)
      })
  }

  private[graft] def parseWavFrames(id: Long, bytes: Array[Byte],
                                    frameSize: Int,
                                    silenceRms: Double): WavFrames = {
    val pcm = wavPcmData(bytes)
    if (pcm == null) return WavFrames(id, valid = false, 0L, 0L, 0.0)
    val (_, dataOff, n) = pcm
    val nFrames = n / frameSize
    var silent = 0L
    var maxRms = 0.0
    var f = 0
    while (f < nFrames) {
      var sumSq = 0L
      var k = 0
      while (k < frameSize) {
        val s = pcmSample(bytes, dataOff, f * frameSize + k)
        sumSq += s.toLong * s
        k += 1
      }
      // same quantization the oracle applies: round(sqrt(Σs²/F), 6)
      val rms = BigDecimal(math.sqrt(sumSq.toDouble / frameSize))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (rms < silenceRms) silent += 1
      if (rms > maxRms) maxRms = rms
      f += 1
    }
    WavFrames(id, valid = true, nFrames.toLong, silent, maxRms)
  }

  /** One row PER FRAME — the grid q322's energy-gated segmentation
    * consumes (audioFrameEnergy's per-clip summary can't say WHERE the
    * speech is). Same frame rule as parseWavFrames: non-overlapping
    * `frameSize`-sample frames, incomplete tail dropped, RMS from the
    * exact integer Σs² quantized 6dp. Corrupt payloads emit NO rows
    * here — quarantine accounting is audioFrameEnergy's job (q193);
    * a segmentation over a half-decoded clip would be garbage. */
  case class WavFrameRow(doc_id: Long, frame_idx: Long, rms: Double)

  implicit val wavFrameRowEnc: Encoder[WavFrameRow] = Encoders.product[WavFrameRow]

  def audioFrameGrid(payloadDf: DataFrame,
                     frameSize: Int): Dataset[WavFrameRow] = {
    require(frameSize >= 1, "frameSize must be positive")
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val pcm = wavPcmData(bytes)
        if (pcm == null) Iterator.empty
        else {
          val (_, dataOff, n) = pcm
          val nFrames = n / frameSize
          (0 until nFrames).iterator.map { f =>
            var sumSq = 0L
            var k = 0
            while (k < frameSize) {
              val s = pcmSample(bytes, dataOff, f * frameSize + k)
              sumSq += s.toLong * s
              k += 1
            }
            WavFrameRow(id, f.toLong,
              BigDecimal(math.sqrt(sumSq.toDouble / frameSize))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      })
  }

  /** Resize analog (STUB — real codecs absent): keep every `stride`-th
    * byte of the payload, the deterministic stand-in for image
    * downsampling. Same mapPartitions contract as extractFeatures:
    * batched, narrow, binary-in/binary-out — a real resampler swaps in
    * without touching the plan. */
  def resizePayload(payloadDf: DataFrame, stride: Int): Dataset[(Long, Array[Byte])] =
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
          (id, out)
        }
      }

  /** Frame-sampling analog: every k-th fixed-size slice of the payload
    * (for video this would be every k-th frame). Row-local, emits an
    * array column — demonstrates the batch shape without a codec. */
  def sampleSlices(payloadDf: DataFrame, sliceBytes: Int, everyK: Int): DataFrame =
    payloadDf.select(
      col("doc_id"),
      transform(
        sequence(lit(0), greatest(ceil(length(col("payload")) / lit(sliceBytes * everyK)).cast("int") - 1, lit(0))),
        i => col("payload").substr(lit(1) + i * (sliceBytes * everyK), lit(sliceBytes))
      ).as("slices"))
}
