package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal tests: decodePpm is a REAL image decode (codec-free
  * format, exact channel means asserted); the codec-format seam stays
  * a documented STUB, where what's under test is the real contract —
  * schema shape, binary round-trip, mapPartitions batching,
  * determinism, slice sampling. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).limit(50)

  test("assemble nests doc/meta/vec structs addressable by field path") {
    val out = Multimodal.assemble(
      Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))
    val row = out.select(
        col("doc_id"), col("doc.meta.lang"), col("vec.label"),
        size(col("vec.embedding")).as("dims"))
      .orderBy("doc_id").limit(1).collect()(0)
    assert(!row.isNullAt(1) && !row.isNullAt(2))
    assert(row.getInt(3) > 0)
    // join must be 1:1 on the fixture ids
    assert(out.count() === out.select("doc_id").distinct().count())
  }

  test("withBinaryPayload: payload decodes back to the text; metadata typed") {
    val bad = Multimodal.withBinaryPayload(docs)
      .select(col("doc_id"),
        decode(col("payload"), "UTF-8").as("roundtrip"),
        col("media_meta.mime"), col("media_meta.n_bytes"))
      .join(docs, "doc_id")
      .filter(col("roundtrip") =!= col("text") || col("mime") =!= "text/plain")
    assert(bad.isEmpty)
  }

  test("extractFeatures (stub decoder) is deterministic and reports true byte length") {
    val payloads = Multimodal.withBinaryPayload(docs)
    val a = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq) // stable across runs — stub contract
    val lens = docs.select(col("doc_id"), length(col("text")).cast("int").as("n"))
      .as[(Long, Int)].collect().toMap
    for (f <- a) {
      assert(f.n_bytes === lens(f.doc_id)) // fixture text is ASCII
      assert(f.width >= 64 && f.height >= 64)
    }
  }

  test("resizePayload (stub) keeps every stride-th byte, ceil-length output") {
    val df = Seq((1L, "abcdefghij"), (2L, "xyz")).toDF("doc_id", "text")
    val out = Multimodal.resizePayload(Multimodal.withBinaryPayload(df), 3)
      .collect().map { case (id, b) => id -> new String(b, "UTF-8") }.toMap
    assert(out === Map(1L -> "adgj", 2L -> "x"))
  }

  test("decodePpm: real P6 decode — dims, channel means, comments; corrupt → invalid row") {
    // 2×2 image, maxval 255, with a header comment. Pixels:
    // (255,0,0) (0,255,0) / (0,0,255) (30,60,90)
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 30, 60, 90).map(_.toByte)
    val good = header ++ raster
    val truncated = good.dropRight(3)       // raster shorter than w·h·3
    val notPpm = "hello world".getBytes("UTF-8")
    // malformed: no whitespace separator after maxval
    val badSep = "P6\n2 2\n255".getBytes("US-ASCII") ++ raster
    val rows = Seq((1L, good), (2L, truncated), (3L, notPpm), (4L, badSep))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodePpm(rows).collect()
      .map(f => f.doc_id -> f).toMap
    val ok = got(1L)
    assert(ok.valid && ok.width === 2 && ok.height === 2)
    assert(ok.mean_r === (255 + 0 + 0 + 30) / 4.0)
    assert(ok.mean_g === (0 + 255 + 0 + 60) / 4.0)
    assert(ok.mean_b === (0 + 0 + 255 + 90) / 4.0)
    assert(!got(2L).valid && !got(3L).valid && !got(4L).valid,
      "corrupt payloads must quarantine as invalid rows, not fail the task")
    assert(got.size === 4, "every payload yields exactly one row")
  }

  test("syntheticPpm round-trips through decodePpm per the q94 arithmetic contract") {
    // the generator's documented arithmetic, recomputed independently:
    // w = 4+id%5, h = 3+id%4, byte j = (id*31+j)%256; id%7==0 corrupt.
    val rows = (0L to 40L).map(id => (id, Multimodal.syntheticPpm(id)))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodePpm(rows).collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 40L) {
      val f = got(id)
      if (id % 7 == 0) assert(!f.valid, s"id $id planted-corrupt must be invalid")
      else {
        val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
        assert(f.valid && f.width === w && f.height === h, s"dims wrong for id $id")
        def mean(c: Int) =
          (0 until w * h).map(p => (id * 31 + 3 * p + c) % 256).sum.toDouble / (w * h)
        assert(f.mean_r === mean(0) && f.mean_g === mean(1) && f.mean_b === mean(2),
          s"channel means wrong for id $id")
      }
    }
  }

  test("syntheticWav round-trips through decodeWav per the q129 arithmetic contract") {
    val rows = (0L to 40L).map(id => (id, Multimodal.syntheticWav(id)))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeWav(rows).collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 40L) {
      val f = got(id)
      if (id % 7 == 0) assert(!f.valid, s"id $id planted-corrupt must be invalid")
      else {
        val n = (50 + id % 32).toInt
        val samples = (0 until n).map(k => (id * 7 + k * 13) % 2001 - 1000)
        assert(f.valid && f.sample_rate === (8000 + (id % 4) * 4000).toInt
          && f.n_samples === n.toLong, s"header wrong for id $id")
        assert(f.mean === samples.sum.toDouble / n, s"mean wrong for id $id")
        assert(f.rms === math.sqrt(samples.map(s => s * s).sum.toDouble / n),
          s"rms wrong for id $id")
      }
    }
  }

  test("decodeWav quarantines non-PCM, stereo, and size-overrun payloads") {
    def mutate(id: Long)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = Multimodal.syntheticWav(id)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      f(bb); b
    }
    val cases = Seq(
      "non-pcm" -> mutate(1)(_.putShort(20, 3.toShort)),    // format = IEEE float
      "stereo" -> mutate(1)(_.putShort(22, 2.toShort)),     // channels = 2
      "overrun" -> mutate(1)(_.putInt(40, 1 << 20)),        // data size > payload
      "not-riff" -> "JUNKJUNKJUNK".getBytes("US-ASCII"))
    for ((name, bytes) <- cases)
      assert(!Multimodal.parseWav(9L, bytes).valid, s"$name must quarantine")
    // and an untouched payload still decodes (the mutations were the cause)
    assert(Multimodal.parseWav(1L, Multimodal.syntheticWav(1L)).valid)
  }

  test("parsePpmThumb: factor-2 sampling matches the direct pixel formula; factor 1 equals the full decode") {
    // id 3: w=7, h=6 → ow=4, oh=3; raster byte j = (3·31 + j) % 256
    val id = 3L
    val bytes = Multimodal.syntheticPpm(id)
    val t = Multimodal.parsePpmThumb(id, bytes, 2)
    assert(t.valid && t.out_w === 4 && t.out_h === 3)
    def mean(c: Int): Double = {
      val vals = for (y <- 0 until 3; x <- 0 until 4)
        yield ((id * 31 + 3 * ((2 * y) * 7 + 2 * x) + c) % 256).toDouble
      vals.sum / vals.length
    }
    assert(t.mean_r === mean(0) && t.mean_g === mean(1) && t.mean_b === mean(2))
    // factor 1 = no resize: means equal the full decoder's
    val full = Multimodal.parsePpm(id, bytes)
    val f1 = Multimodal.parsePpmThumb(id, bytes, 1)
    assert((f1.out_w, f1.out_h, f1.mean_r, f1.mean_g, f1.mean_b) ===
      ((full.width, full.height, full.mean_r, full.mean_g, full.mean_b)))
  }

  test("parsePpmThumb quarantines the planted-truncated raster") {
    val id = 7L // id % 7 == 0 → raster short one byte
    val t = Multimodal.parsePpmThumb(id, Multimodal.syntheticPpm(id), 2)
    assert(!t.valid && t.out_w === 0 && t.out_h === 0)
  }

  test("parseWavFrames: frame RMS grid matches direct computation, tail frame drops, corrupt quarantines") {
    // id 2: n = 52 samples → 2 full 25-sample frames, 2-sample tail dropped
    val id = 2L
    val w = Multimodal.parseWavFrames(id, Multimodal.syntheticWav(id), 25, 300.0)
    assert(w.valid && w.n_frames === 2L)
    def rms(f: Int): Double = {
      val ss = (0 until 25).map { k =>
        val s = ((id * 7 + (f * 25 + k) * 13) % 2001 - 1000).toDouble
        s * s
      }.sum
      BigDecimal(math.sqrt(ss / 25))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Seq(rms(0), rms(1))
    assert(w.max_rms === expected.max)
    assert(w.n_silent === expected.count(_ < 300.0))
    // corrupt payload (id % 7 == 0: truncated data chunk) quarantines
    val bad = Multimodal.parseWavFrames(7L, Multimodal.syntheticWav(7L), 25, 300.0)
    assert(!bad.valid && bad.n_frames === 0L)
  }

  test("sampleSlices emits fixed-size prefix slices of the payload") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val slices = Multimodal.sampleSlices(
        Multimodal.withBinaryPayload(df), sliceBytes = 3, everyK = 1)
      .select(transform(col("slices"), s => decode(s, "UTF-8")).as("s"))
      .as[Seq[String]].head()
    assert(slices.nonEmpty)
    assert(slices.head === "abc") // first slice = first 3 bytes
    for (s <- slices) assert(s.length <= 3)
  }

  test("ppmAHash: additive brightness shifts preserve the hash; structure changes flip it; truncation quarantines") {
    def ppm(raster: Array[Int]): Array[Byte] = {
      val hb = "P6\n2 2\n255\n".getBytes("US-ASCII")
      hb ++ raster.map(_.toByte)
    }
    // 2x2: pixel 0 bright, others dark -> only bit 0 set
    val base = Array(200, 200, 200,  10, 10, 10,  10, 10, 10,  10, 10, 10)
    val brightened = base.map(v => v + 40) // uniform additive shift, no wrap
    val restructured = Array(10, 10, 10,  200, 200, 200,  10, 10, 10,  10, 10, 10)
    val rows = Seq(
      (1L, ppm(base)), (2L, ppm(brightened)), (3L, ppm(restructured)),
      (4L, ppm(base).dropRight(1))) // truncated raster
    val got = Multimodal.ppmAHash(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(got(1L).valid && got(1L).phash === 1L, s"bit 0 only: ${got(1L)}")
    assert(got(2L).phash === got(1L).phash,
      "aHash is relative to the image mean - a uniform brightness shift must not change it")
    assert(got(3L).valid && got(3L).phash === 2L,
      s"moving the bright pixel must move the bit: ${got(3L)}")
    assert(!got(4L).valid, "truncated raster must quarantine, not throw")
  }

  test("ppmAHash: rasters over 64 pixels quarantine instead of silently aliasing bits mod 64") {
    // 9x8 = 72 px: pixel 64 would shift-wrap onto bit 0 (1L << 64 ==
    // 1L on the JVM) and collide with pixel 0's bit — the r13 ADVICE
    // hazard. The guard must return valid=false (route through
    // downsamplePpm first), never a silently-aliased hash.
    val w = 9; val h = 8
    val hb = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = Array.fill(w * h * 3)(10.toByte)
    raster(64 * 3) = 200.toByte // the aliasing pixel, bright
    val got = Multimodal.ppmAHash(Seq((1L, hb ++ raster))
      .toDF("doc_id", "payload")).collect().head
    assert(!got.valid, s"oversized raster must quarantine: $got")
    assert(got.width === w && got.height === h,
      "quarantine row should still report the decoded dims")
    // and the boundary case stays in: exactly 64 px hashes fine
    val hb64 = "P6\n8 8\n255\n".getBytes("US-ASCII")
    val r64 = Array.fill(8 * 8 * 3)(10.toByte)
    r64(63 * 3) = 200.toByte
    val got64 = Multimodal.ppmAHash(Seq((2L, hb64 ++ r64))
      .toDF("doc_id", "payload")).collect().head
    assert(got64.valid && got64.phash === (1L << 63),
      s"64-pixel raster is exactly representable: $got64")
  }

  test("syntheticVideo round-trips through the container walk; frame 0 matches the image kernel") {
    // id = 1: nf = 5 frames of 5x4; frame 0's raster formula is
    // EXACTLY syntheticPpm(1)'s (scene 0, f 0), so its phash must
    // equal the image path's — the two decoders share one kernel
    val frames = Multimodal.videoFrameHashes(
      Seq((1L, Multimodal.syntheticVideo(1L))).toDF("doc_id", "payload"))
      .collect().sortBy(_.frame)
    assert(frames.length === 5)
    assert(frames.forall(f => f.valid && f.width === 5 && f.height === 4))
    assert(frames.map(_.frame).toSeq === Seq(0, 1, 2, 3, 4))
    val img = Multimodal.ppmAHash(
      Seq((1L, Multimodal.syntheticPpm(1L))).toDF("doc_id", "payload"))
      .collect().head
    assert(frames.head.phash === img.phash,
      "video frame 0 and the q94 image share the raster formula")
    // scene structure: frames 0-2 share a scene (tiny drift), frame 3
    // starts a new scene (the *97 jump re-randomizes the pattern)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(frames(0).phash, frames(1).phash) <= 4)
    assert(ham(frames(1).phash, frames(2).phash) <= 4)
  }

  test("parseVideo quarantines truncated (id % 11) and malformed containers whole") {
    val t = Multimodal.parseVideo(11L, Multimodal.syntheticVideo(11L))
    assert(t === Seq(Multimodal.VideoFrameHash(11L, valid = false, -1, 0, 0, 0L)))
    // header lies about the frame count: 3 promised, 2 shipped
    val two = Multimodal.syntheticVideo(1L)
    val lying = ("GV1 9\n".getBytes("US-ASCII") ++
      two.drop("GV1 5\n".length))
    assert(Multimodal.parseVideo(1L, lying).head.valid === false)
    assert(Multimodal.parseVideo(1L, "notavideo".getBytes).head.valid === false)
    // determinism + partition invariance of the dataset path
    val ids = (0L to 40L)
    val df = ids.map(i => (i, Multimodal.syntheticVideo(i))).toDF("doc_id", "payload")
    val a = Multimodal.videoFrameHashes(df).collect().toSet
    val b = Multimodal.videoFrameHashes(df.repartition(7)).collect().toSet
    assert(a === b)
    // every id % 11 == 0 container quarantined, everything else fully framed
    assert(a.filter(!_.valid).map(_.doc_id) === ids.filter(_ % 11 == 0).toSet)
    ids.filter(_ % 11 != 0).foreach { i =>
      assert(a.count(r => r.doc_id == i && r.valid) === (4 + i % 5).toInt, s"id $i")
    }
  }
  test("parseBmp: flip sensitivity, header gates, padding; partition invariance") {
    import Multimodal.BmpFeatures
    // hand-crafted 2x2 bottom-up vs top-down pair holding the SAME
    // image: decoded features must be identical, and top_row_gray
    // must read the IMAGE top row (the flip is load-bearing — means
    // alone are row-order-invariant and could not catch a decoder
    // that ignored biHeight's sign)
    def mk(topDown: Boolean): Array[Byte] = {
      val w = 2; val h = 2; val rowSize = 8 // 3*2=6 padded to 8
      val bb = java.nio.ByteBuffer.allocate(54 + rowSize * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
        .putInt(0).putInt(54).putInt(40).putInt(w)
        .putInt(if (topDown) -h else h)
      bb.putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      bb.putInt(0).putInt(0).putInt(0).putInt(0)
      // image rows: top row pixels gray 30 (10,10,10); bottom 300
      val top = Array[Byte](10, 10, 10, 10, 10, 10, 0, 0)
      val bot = Array[Byte](100, 100, 100, 100, 100, 100, 0, 0)
      if (topDown) { bb.put(top); bb.put(bot) }
      else { bb.put(bot); bb.put(top) }
      bb.array()
    }
    val up = Multimodal.parseBmp(1L, mk(topDown = false))
    val dn = Multimodal.parseBmp(2L, mk(topDown = true))
    assert(up.valid && dn.valid)
    assert(up.top_down === false && dn.top_down === true)
    assert(up.top_row_gray === 60L && dn.top_row_gray === 60L)
    assert(up.mean_r === dn.mean_r && up.mean_b === dn.mean_b)
    // header gates: foreign magic, 32bpp, compressed, short raster
    assert(!Multimodal.parseBmp(3L, "notabitmap".getBytes).valid)
    val good = Multimodal.syntheticBmp(1L)
    assert(Multimodal.parseBmp(1L, good).valid)
    assert(!Multimodal.parseBmp(1L, good.dropRight(1)).valid)
    val bpp32 = good.clone(); bpp32(28) = 32
    assert(!Multimodal.parseBmp(1L, bpp32).valid)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(!Multimodal.parseBmp(1L, rle).valid)
    // synthetic round-trip: planted quarantines land exactly on the
    // documented ids; determinism + partition invariance
    val ids = (0L to 60L)
    val df = ids.map(i => (i, Multimodal.syntheticBmp(i))).toDF("doc_id", "payload")
    val a = Multimodal.decodeBmp(df).collect().toSet
    val b = Multimodal.decodeBmp(df.repartition(7)).collect().toSet
    assert(a === b)
    assert(a.filter(!_.valid).map(_.doc_id) ===
      ids.filter(i => i % 7 == 0 || i % 9 == 0).toSet)
    assert(a.filter(_.top_down).map(_.doc_id) ===
      ids.filter(i => i % 6 == 0 && i % 7 != 0 && i % 9 != 0).toSet)
  }
}
