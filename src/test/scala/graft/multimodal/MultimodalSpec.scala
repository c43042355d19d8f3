package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("frame sampling reassembles to the original prefix") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val frames = Multimodal.sampleFrames(df, "blob", frameSize = 4, stride = 1)
      .orderBy("frame_idx")
      .select(col("frame").cast("string"))
      .collect().map(_.getString(0))
    assert(frames.toSeq === Seq("abcd", "efgh", "ij"))
  }

  test("stride keeps every nth frame") {
    val df = Seq((1L, "aabbccddee")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val idx = Multimodal.sampleFrames(df, "blob", frameSize = 2, stride = 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq === Seq(0, 2, 4))
  }

  test("feature extraction is deterministic, fixed-length, in [0,1)") {
    val docs = Tables.t(spark, sf, "documents").limit(20)
      .withColumn("blob", col("text").cast("binary"))
    val a = Multimodal.extractFeatures(docs, "blob", dims = 8)
      .select("doc_id", "media_features").collect()
    val b = Multimodal.extractFeatures(docs, "blob", dims = 8)
      .select("doc_id", "media_features").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 8)
      assert(v.forall(x => x >= 0.0 && x < 1.0))
    }
  }

  test("ImageCodec: PNG round-trip gives exact metadata and pixel means") {
    import Multimodal.ImageCodec
    val png = ImageCodec.encodePng(20, 12, 10, 200, 77)
    val m = ImageCodec.decodeMeta(png)
    assert((m.width, m.height, m.channels, m.format) === (20, 12, 3, "png"))
    assert(ImageCodec.channelMeans(png).toSeq === Seq(10.0, 200.0, 77.0))
  }

  test("ImageCodec: JPEG decodes with exact dims; lossy means stay close") {
    import Multimodal.ImageCodec
    val jpg = ImageCodec.encodeJpeg(33, 17, 120, 60, 180)
    val m = ImageCodec.decodeMeta(jpg)
    assert((m.width, m.height, m.channels) === (33, 17, 3))
    assert(m.format.startsWith("jp"), s"format was ${m.format}")
    val means = ImageCodec.channelMeans(jpg)
    Seq(120.0, 60.0, 180.0).zip(means).foreach { case (want, got) =>
      assert(math.abs(want - got) < 12.0,
        s"JPEG mean drifted implausibly: want ~$want got $got")
    }
  }

  test("ImageCodec: downscale preserves aspect ratio, solid color, determinism") {
    import Multimodal.ImageCodec
    val png = ImageCodec.encodePng(64, 32, 5, 6, 7)
    val small = ImageCodec.downscale(png, 16)
    val m = ImageCodec.decodeMeta(small)
    assert((m.width, m.height) === (16, 8)) // longest edge 64 -> 16
    assert(ImageCodec.channelMeans(small).toSeq === Seq(5.0, 6.0, 7.0))
    // bit-deterministic: the integer box filter + PNG encode must be
    // byte-identical across calls (the 100 TB contract: re-running a
    // stage on the same blob yields the same blob)
    assert(java.util.Arrays.equals(small, ImageCodec.downscale(png, 16)))
    // an image already inside the budget keeps its dims
    val asIs = ImageCodec.decodeMeta(ImageCodec.downscale(
      ImageCodec.encodePng(10, 14, 1, 2, 3), 16))
    assert((asIs.width, asIs.height) === (10, 14))
  }

  test("ImageCodec: undecodable bytes yield null, not an exception") {
    import Multimodal.ImageCodec
    assert(ImageCodec.decodeMeta("not an image".getBytes) === null)
    assert(ImageCodec.channelMeans(Array.emptyByteArray) === null)
    assert(ImageCodec.downscale(null, 16) === null)
    // and through the UDF path: corrupt rows become NULL columns that
    // survive the projection (quarantine is the caller's filter)
    val df = Seq((1L, "corrupt".getBytes), (2L, ImageCodec.encodePng(4, 4, 9, 9, 9)))
      .toDF("id", "blob")
      .withColumn("meta", ImageCodec.decodeMetaUdf(col("blob")))
    val rows = df.select(col("id"), col("meta").isNull.as("bad"))
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, true), (2L, false)))
  }

  test("AudioCodec: WAV round-trip gives exact metadata and channel means") {
    import Multimodal.AudioCodec
    val wav = AudioCodec.encodeWav(400, 8000, Array(1234.toShort, (-2000).toShort))
    val m = AudioCodec.decodeMeta(wav)
    assert((m.sampleRate, m.channels, m.bitsPerSample, m.frames) ===
      (8000, 2, 16, 400L))
    assert(m.durationMs === 50L) // 400 frames / 8 frames-per-ms
    assert(m.format === "pcm_signed")
    assert(AudioCodec.channelMeans(wav).toSeq === Seq(1234.0, -2000.0))
    assert(AudioCodec.peak(wav).intValue === 2000)
  }

  test("AudioCodec: decimation downsample keeps ceil(frames/k) at rate/k") {
    import Multimodal.AudioCodec
    // 401 frames: non-divisible by 4, so the last partial stride still
    // emits a frame — ceil semantics, mirrored by the oracle SQL
    val wav = AudioCodec.encodeWav(401, 8000, Array(777.toShort))
    val ds = AudioCodec.downsample(wav, 4)
    val m = AudioCodec.decodeMeta(ds)
    assert((m.sampleRate, m.channels, m.frames) === (2000, 1, 101L))
    // constant fill survives decimation exactly
    assert(AudioCodec.channelMeans(ds).toSeq === Seq(777.0))
  }

  test("AudioCodec: undecodable bytes yield null through the UDF path") {
    import Multimodal.AudioCodec
    assert(AudioCodec.decodeMeta("not audio".getBytes) === null)
    assert(AudioCodec.channelMeans(Array.emptyByteArray) === null)
    assert(AudioCodec.downsample(null, 2) === null)
    val df = Seq((1L, "corrupt".getBytes),
      (2L, AudioCodec.encodeWav(8, 8000, Array(5.toShort))))
      .toDF("id", "blob")
      .withColumn("meta", AudioCodec.decodeMetaUdf(col("blob")))
    val rows = df.select(col("id"), col("meta").isNull.as("bad"))
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, true), (2L, false)))
  }

  test("aHash recovers the pattern exactly and survives a resize") {
    import Multimodal.ImageCodec
    val patterns = Seq(0L, 0x00FF00FF00FF00FFL, 0x123456789ABCDEFL,
      255L << 56, 1L)
    patterns.foreach { p =>
      val png = ImageCodec.encodePatternPng(p, cell = 4)
      assert(ImageCodec.aHash(png).longValue === p, s"pattern $p")
      // the perceptual contract: a downscaled re-encode hashes identically
      val small = ImageCodec.downscale(png, 16) // 32x32 -> 16x16
      assert(ImageCodec.aHash(small).longValue === p, s"resized pattern $p")
    }
    assert(ImageCodec.aHash("junk".getBytes) === null)
  }

  test("fingerprintPairs finds exactly the within-radius pairs") {
    import Multimodal.ImageCodec
    import graft.text.DedupOps
    // base, 1-bit variant, 2-bit variant, and a far pattern (byte flip)
    val base = 0x00FF00FF00FF00FFL
    val rows = Seq(
      (1L, base), (2L, base ^ 1L), (3L, base ^ 3L), (4L, base ^ 255L))
    val df = rows.toDF("doc_id", "p")
      .withColumn("blob", ImageCodec.encodePatternPngUdf(col("p"), lit(4)))
      .withColumn("fp", ImageCodec.aHashUdf(col("blob")))
    val pairs = DedupOps.fingerprintPairs(df, "doc_id", "fp", maxHamming = 2)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 4 is >= 7 bits from everything; (1,3)=2, (1,2)=1, (2,3)=1
    assert(pairs.toSeq === Seq((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1)))
  }

  test("fingerprintPairs radius 0 buckets on the full fingerprint") {
    import graft.text.DedupOps
    // radius 0 → one 64-bit chunk; the mask must be -1L, not
    // (1L << 64) - 1 == 0 (which would put every row in one bucket —
    // a full cross join). Exact-duplicate semantics: only identical
    // fingerprints pair, including ones with the sign bit set.
    val rows = Seq(
      (1L, 0x8000000000000001L), (2L, 0x8000000000000001L),
      (3L, 0x8000000000000000L), (4L, 1L))
    val pairs = DedupOps.fingerprintPairs(
      rows.toDF("doc_id", "fp"), "doc_id", "fp", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
    intercept[IllegalArgumentException] {
      DedupOps.fingerprintPairs(rows.toDF("doc_id", "fp"), "doc_id", "fp", -1)
    }
  }

  test("VideoCodec: walker pins the first vids stream, ignores others") {
    import Multimodal.{ImageCodec, VideoCodec}
    // hand-rolled two-stream AVI: stream 00 = 2 MPNG frames (fill 50),
    // stream 01 = 1 foreign frame (fill 200). The walker must report
    // ONLY stream 00's geometry/frames — not merge both streams.
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(t: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ le32(4 + body.length) ++
        t.getBytes("US-ASCII") ++ body
    def strh(scale: Int, rate: Int): Array[Byte] = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MPNG".getBytes("US-ASCII") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(scale) ++ le32(rate) ++
        le32(0) ++ le32(2) ++ le32(0) ++ le32(-1) ++ le32(0) ++
        le32(0) ++ le32(0))
    val avih = chunk("avih", le32(100000) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(2) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(8) ++ le32(8) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val f00 = (0 until 2).map(_ => ImageCodec.encodePng(8, 8, 50, 50, 50))
    val f01 = ImageCodec.encodePng(8, 8, 200, 200, 200)
    val hdrl = list("hdrl", avih ++ list("strl", strh(1, 10)) ++
      list("strl", strh(1, 99)))
    val movi = list("movi",
      chunk("00dc", f00(0)) ++ chunk("01dc", f01) ++ chunk("00dc", f00(1)))
    val blob = "RIFF".getBytes("US-ASCII") ++
      le32(4 + hdrl.length + movi.length) ++ "AVI ".getBytes("US-ASCII") ++
      hdrl ++ movi
    val m = VideoCodec.decodeMeta(blob)
    assert(m !== null)
    assert(m.nFrames === 2)   // stream 01's frame not merged in
    assert(m.fps === 10)      // first vids strh wins, not the 99-fps one
    val means = VideoCodec.frameMeans(blob)
    assert(means.toSeq === Seq(50.0, 50.0))
  }

  test("VideoCodec: AVI round-trip gives exact metadata and frame payloads") {
    import Multimodal.{ImageCodec, VideoCodec}
    val frames = (0 until 5).map(i => ImageCodec.encodePng(12, 9, i * 10, 0, 0))
    val avi = VideoCodec.encodeAvi(frames, 12, 9, 10)
    val m = VideoCodec.decodeMeta(avi)
    assert((m.width, m.height, m.nFrames, m.fps, m.durationMs, m.codec) ===
      (12, 9, 5, 10, 500L, "mpng"))
    // container walk returns the payloads byte-identical — the movi
    // chunks must not be disturbed by word-alignment padding
    val back = VideoCodec.frames(avi)
    assert(back.length === 5)
    frames.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(VideoCodec.frameMeans(avi).toSeq ===
      Seq(0.0, 10.0, 20.0, 30.0, 40.0))
  }

  test("VideoCodec: odd-size frame payloads survive chunk padding") {
    import Multimodal.VideoCodec
    // raw odd/even-length payloads straight through the container: the
    // RIFF writer pads odd chunks, the walker must strip the pad byte
    val raw = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val avi = VideoCodec.encodeAvi(raw, 1, 1, 1)
    val back = VideoCodec.frames(avi)
    assert(back.map(_.toSeq).toSeq === raw.map(_.toSeq))
    // payloads that aren't PNG quarantine the pixel-level stats ...
    assert(VideoCodec.frameMeans(avi) === null)
    // ... but container-level metadata still reads
    assert(VideoCodec.decodeMeta(avi).nFrames === 3)
  }

  test("VideoCodec: scene cuts at the fill jumps, none on a flat clip") {
    import Multimodal.VideoCodec
    val clip = VideoCodec.encodeSolidAvi(6, 8, 8, 10, cutIdx = 4, vA = 50, vB = 90)
    assert(VideoCodec.sceneCuts(clip, 20.0).toSeq === Seq(4))
    val flat = VideoCodec.encodeSolidAvi(6, 8, 8, 10, cutIdx = -1, vA = 50, vB = 90)
    assert(VideoCodec.sceneCuts(flat, 20.0).toSeq === Seq.empty)
  }

  test("VideoCodec: decimation keeps every kth frame, bit-deterministic") {
    import Multimodal.VideoCodec
    val clip = VideoCodec.encodeSolidAvi(7, 8, 8, 12, cutIdx = 3, vA = 10, vB = 200)
    val small = VideoCodec.decimate(clip, 3)
    val m = VideoCodec.decodeMeta(small)
    assert((m.nFrames, m.fps) === (3, 12)) // frames 0,3,6
    assert(VideoCodec.frameMeans(small).toSeq === Seq(10.0, 200.0, 200.0))
    assert(java.util.Arrays.equals(small, VideoCodec.decimate(clip, 3)))
  }

  test("VideoCodec: walker collects frames wrapped in AVI-1.0 'rec ' lists") {
    import Multimodal.VideoCodec
    // hand-built minimal AVI: our writer never emits interleave-grouping
    // 'rec ' lists, but real AVI 1.0 files do — the walker must descend
    def le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def ck(id: String, d: Array[Byte]) =
      cc(id) ++ le(d.length) ++ d ++ (if ((d.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def li(t: String, b: Array[Byte]) = cc("LIST") ++ le(4 + b.length) ++ cc(t) ++ b
    val avih = {
      val d = new Array[Byte](56)
      le(7).copyToArray(d, 32); le(5).copyToArray(d, 36) // width, height
      ck("avih", d)
    }
    val strh = {
      val d = new Array[Byte](56)
      cc("vids").copyToArray(d, 0)
      le(1).copyToArray(d, 20); le(10).copyToArray(d, 24) // scale, rate
      ck("strh", d)
    }
    val payload = Array[Byte](9, 8, 7)
    val movi = li("movi", li("rec ", ck("00dc", payload)))
    val body = li("hdrl", avih ++ li("strl", strh)) ++ movi
    val avi = cc("RIFF") ++ le(4 + body.length) ++ cc("AVI ") ++ body
    val m = VideoCodec.decodeMeta(avi)
    assert((m.width, m.height, m.nFrames, m.fps) === (7, 5, 1, 10))
    assert(VideoCodec.frames(avi).map(_.toSeq).toSeq === Seq(payload.toSeq))
  }

  test("VideoCodec: undecodable bytes yield null through the UDF path") {
    import Multimodal.VideoCodec
    val df = Seq(
      (1L, "not a video".getBytes("UTF-8")),
      (2L, VideoCodec.encodeSolidAvi(3, 8, 8, 5, -1, 7, 7)),
      (3L, Array.empty[Byte]),
      // truncated mid-chunk: magic intact, movi list cut short
      (4L, VideoCodec.encodeSolidAvi(3, 8, 8, 5, -1, 7, 7).take(60))
    ).toDF("id", "blob")
      .withColumn("meta", VideoCodec.decodeMetaUdf(col("blob")))
      .withColumn("means", VideoCodec.frameMeansUdf(col("blob")))
      .orderBy("id")
    val rows = df.select("id", "meta", "means").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(!rows(1).isNullAt(1) &&
      rows(1).getAs[Seq[Double]](2) === Seq(7.0, 7.0, 7.0))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))
  }

  test("media metadata carries size and type") {
    val df = Seq((1L, "hello")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val m = Multimodal.withMediaMeta(df, "blob", "image", "png")
      .select("media_meta.media_type", "media_meta.codec", "media_meta.size_bytes")
      .head()
    assert((m.getString(0), m.getString(1), m.getLong(2)) === ("image", "png", 5L))
  }

  test("ImageCodec: header-depth metadata vs pixel-depth quarantine") {
    import Multimodal.ImageCodec
    // valid header, corrupt pixel data: metadata is readable (header
    // depth, by contract), pixel stages quarantine with null. Corrupt
    // by zeroing the IDAT payload — the zlib stream turns invalid
    // while IHDR stays intact.
    val full = ImageCodec.encodePng(20, 10, 1, 2, 3)
    val idat = full.indexOfSlice("IDAT".getBytes("US-ASCII"))
    assert(idat > 0)
    val corrupt = full.clone()
    (idat + 4 until math.min(full.length, idat + 24)).foreach(corrupt(_) = 0)
    val m = ImageCodec.decodeMeta(corrupt)
    assert(m !== null)
    assert((m.width, m.height, m.format) === (20, 10, "png"))
    assert(ImageCodec.channelMeans(corrupt) === null)
    assert(ImageCodec.aHash(corrupt) === null)
    // bytes nothing claims: null at every depth
    assert(ImageCodec.decodeMeta("not an image".getBytes("UTF-8")) === null)
  }

  test("AudioCodec: pattern WAV windowMeans recover the pattern exactly") {
    import Multimodal.AudioCodec
    val pattern = 0xA5C3000000000F01L
    val blob = AudioCodec.encodePatternWav(pattern, 25, 20000, 1000)
    val means = AudioCodec.windowMeans(blob, 64)
    (0 until 64).foreach { i =>
      val expected = if (((pattern >>> i) & 1L) != 0L) 20000.0 else 1000.0
      assert(means(i) === expected, s"window $i")
    }
    // a clip shorter than the window count quarantines as null
    assert(AudioCodec.windowMeans(
      AudioCodec.encodeWav(10, 8000, Array(5.toShort)), 64) === null)
  }

  test("VideoCodec: pattern AVI frameMeans recover the pattern exactly") {
    import Multimodal.VideoCodec
    val pattern = 0x80000000000000FFL // includes the sign bit
    val blob = VideoCodec.encodePatternAvi(pattern, 8, 8, 10, 200, 40)
    val m = VideoCodec.decodeMeta(blob)
    assert(m.nFrames === 64)
    val means = VideoCodec.frameMeans(blob)
    (0 until 64).foreach { i =>
      val expected = if (((pattern >>> i) & 1L) != 0L) 200.0 else 40.0
      assert(means(i) === expected, s"frame $i")
    }
  }

  test("VideoCodec: streaming cursor decode equals materialize-then-decode on every frame") {
    // frameMeans streams each frame zero-copy from its blob range
    // (channelMeansAt); frames() materializes copies — the two paths
    // must agree exactly, pinning that the lazy AVI refactor changed
    // memory shape, not behavior (the Mp4CodecSpec twin)
    import Multimodal.{ImageCodec, VideoCodec}
    val blob = VideoCodec.encodeSolidAvi(7, 10, 8, 5, cutIdx = 3, vA = 30, vB = 70)
    val streamed = VideoCodec.frameMeans(blob)
    val materialized = VideoCodec.frames(blob).map(f => ImageCodec.channelMeans(f).head)
    assert(streamed.toSeq === materialized.toSeq)
    assert(streamed.toSeq === Seq(30.0, 30.0, 30.0, 70.0, 70.0, 70.0, 70.0))
  }

  test("means hash equals the encoded pattern when 0 < popcount < 64") {
    import Multimodal.AudioCodec
    // the Column-side comparator used by q251/q252: bit i = mean_i > mu
    val patterns = Seq(0x0101010101010101L, 1L, 0xFF00FF00FF00FF0L)
    val df = patterns.zipWithIndex
      .map { case (p, i) => (i.toLong, AudioCodec.encodePatternWav(p, 25, 20000, 1000)) }
      .toDF("id", "blob")
      .withColumn("means", AudioCodec.windowMeansUdf(64)(col("blob")))
    val out = Multimodal.meansHash(df).orderBy("id")
    assert(out.select("fp").collect().map(_.getLong(0)).toSeq === patterns)
  }

  test("meansHash: NULL means yields NULL fp, not 0 (quarantine survives the hash)") {
    import Multimodal.AudioCodec
    // element_at(NULL, i) > mu is NULL and IF(NULL, a, b) takes the
    // else branch, so an unguarded fold would hash every quarantined
    // decode to fp = 0 — pairing all corrupt rows with each other (and
    // with genuine all-zero fingerprints) at hamming 0 in the
    // downstream join. The guard must surface NULL instead, which the
    // equi-join then drops naturally.
    val df = Seq(
      (0L, AudioCodec.encodePatternWav(5L, 25, 20000, 1000)),
      (1L, "not audio".getBytes("UTF-8")),
      (2L, "also corrupt".getBytes("UTF-8")))
      .toDF("id", "blob")
      .withColumn("means", AudioCodec.windowMeansUdf(64)(col("blob")))
    val out = Multimodal.meansHash(df).select("id", "fp").orderBy("id").collect()
    assert(out(0).getLong(1) === 5L)
    assert(out(1).isNullAt(1), "NULL means must hash to NULL, not 0")
    assert(out(2).isNullAt(1))
    // and through the pair join: the two corrupt rows must NOT pair
    // with each other at hamming 0 (the fp = 0 collapse this guards)
    val fps = Multimodal.meansHash(df).select("id", "fp")
    val pairs = graft.text.DedupOps.fingerprintPairs(fps, "id", "fp", maxHamming = 2)
    assert(pairs.count() === 0)
  }

  test("VideoCodec: adversarial deep-nested LIST blob quarantines, no StackOverflow") {
    import Multimodal.VideoCodec
    // ~60k back-to-back 12-byte LIST headers (~720 KB): a recursive
    // walker overflows the stack — StackOverflowError is an Error,
    // which ESCAPES a `case _: Exception` quarantine and fails the
    // Spark task. The depth-capped walker must return null instead.
    val n = 60000
    val blob = new Array[Byte](12 + 12 * n)
    def put(s: String, off: Int): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, blob, off, 4)
    def putLe(v: Int, off: Int): Unit = {
      blob(off) = (v & 0xff).toByte; blob(off + 1) = ((v >> 8) & 0xff).toByte
      blob(off + 2) = ((v >> 16) & 0xff).toByte; blob(off + 3) = ((v >> 24) & 0xff).toByte
    }
    put("RIFF", 0); putLe(blob.length - 8, 4); put("AVI ", 8)
    var i = 0
    while (i < n) {
      val p = 12 + 12 * i
      put("LIST", p); putLe(blob.length - p - 8, p + 4); put("nest", p + 8)
      i += 1
    }
    assert(VideoCodec.decodeMeta(blob) === null)
    assert(VideoCodec.frameMeans(blob) === null)
    // a legitimately-nested clip (movi → rec ) still decodes — the cap
    // must sit far above spec-shaped nesting (≤ ~4 levels)
    val ok = VideoCodec.encodeSolidAvi(3, 8, 8, 5, -1, 7, 7)
    assert(VideoCodec.decodeMeta(ok).nFrames === 3)
  }

  test("ImageCodec: decompression-bomb header quarantines pixel stages, no OOM") {
    import Multimodal.ImageCodec
    // a PNG whose IHDR declares 50000×50000 (~10 GB raster) but carries
    // 8×8 worth of pixel data: `ImageReader.read` allocates the raster
    // from the HEADER dims before touching IDAT, so an unguarded decode
    // throws OutOfMemoryError — an Error that escapes the quarantine
    // catch. Patch the dims into a real PNG and recompute the IHDR CRC.
    val bomb = ImageCodec.encodePng(8, 8, 1, 2, 3).clone()
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    be32(50000).copyToArray(bomb, 16) // IHDR width  (offset 16, big-endian)
    be32(50000).copyToArray(bomb, 20) // IHDR height (offset 20)
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // "IHDR" + 13 data bytes
    be32(crc.getValue.toInt).copyToArray(bomb, 29)
    // header-depth metadata still reads (a metadata scan can SEE the
    // declared dims and filter on them) ...
    val m = ImageCodec.decodeMeta(bomb)
    assert(m !== null)
    assert((m.width, m.height, m.format) === (50000, 50000, "png"))
    // ... but every pixel-decoding stage quarantines before allocating
    assert(ImageCodec.channelMeans(bomb) === null)
    assert(ImageCodec.aHash(bomb) === null)
    assert(ImageCodec.downscale(bomb, 16) === null)
  }

  test("codec fuzz: corrupt/truncated/bit-flipped blobs never throw through any UDF") {
    import Multimodal.{AudioCodec, ImageCodec, VideoCodec}
    // The quarantine contract, pinned across the WHOLE per-row surface
    // at once: random bytes, truncations of valid blobs at several
    // offsets, single-byte corruptions of valid blobs, empty, and NULL —
    // through every codec UDF in one projection. Undecodable bytes are
    // DATA at 100 TB; the job must complete (nulls in, nulls out), not
    // fail a task. Deterministic seed so a failure reproduces.
    val rnd = new scala.util.Random(42)
    val valid: Seq[Array[Byte]] = Seq(
      ImageCodec.encodePng(12, 7, 1, 2, 3),
      ImageCodec.encodeJpeg(9, 9, 10, 20, 30),
      AudioCodec.encodeWav(50, 8000, Array(123.toShort)),
      VideoCodec.encodeSolidAvi(4, 8, 8, 5, 2, 10, 50))
    val blobs: Seq[Array[Byte]] =
      (1 to 40).map { _ =>
        val b = new Array[Byte](rnd.nextInt(400)); rnd.nextBytes(b); b
      } ++
      valid.flatMap(v => Seq(1, v.length / 4, v.length / 2, v.length - 1)
        .map(v.take)) ++
      valid.map { v =>
        val b = v.clone(); val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ 0x5a).toByte; b
      } ++
      Seq(Array.empty[Byte], null)
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "blob")
      .withColumn("im", ImageCodec.decodeMetaUdf(col("blob")))
      .withColumn("imm", ImageCodec.channelMeansUdf(col("blob")))
      .withColumn("ims", ImageCodec.downscaleUdf(8)(col("blob")))
      .withColumn("imh", ImageCodec.aHashUdf(col("blob")))
      .withColumn("au", AudioCodec.decodeMetaUdf(col("blob")))
      .withColumn("aum", AudioCodec.channelMeansUdf(col("blob")))
      .withColumn("aup", AudioCodec.peakUdf(col("blob")))
      .withColumn("aud", AudioCodec.downsampleUdf(2)(col("blob")))
      .withColumn("auw", AudioCodec.windowMeansUdf(8)(col("blob")))
      .withColumn("vi", VideoCodec.decodeMetaUdf(col("blob")))
      .withColumn("vim", VideoCodec.frameMeansUdf(col("blob")))
      .withColumn("vic", VideoCodec.sceneCutsUdf(10.0)(col("blob")))
      .withColumn("vid", VideoCodec.decimateUdf(2)(col("blob")))
    assert(df.collect().length === blobs.length) // completes, no task failure
  }

  test("cached readers survive reuse across formats, corruption, and repeats") {
    import Multimodal.ImageCodec
    // the per-thread reader cache must behave identically to a fresh
    // reader per call: alternate PNG and JPEG decodes on ONE thread,
    // interleaved with corrupt blobs carrying valid magic (the cached
    // reader throws internally and must reset cleanly via setInput on
    // the next call)
    // the REAL 8-byte PNG signature followed by garbage, spelled as
    // explicit bytes (an earlier form hid the leading 0x89 inside a
    // string literal as an invisible U+0089 char - correct, but
    // unreadable and one editor normalization away from silently
    // degrading to the registry path instead of the cached PNG
    // reader this test exists to exercise)
    val badPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
      0x1a, '\n') ++ "garbage-after-magic".getBytes("ISO-8859-1")
    val badJpg = Array(0xff, 0xd8, 0xff, 0xe0, 1, 2, 3, 4, 5).map(_.toByte)
    (1 to 3).foreach { i =>
      val png = ImageCodec.encodePng(10 + i, 7, i, 2 * i, 3 * i)
      assert(ImageCodec.channelMeans(png).toSeq ===
        Seq(i.toDouble, 2.0 * i, 3.0 * i), s"png round $i")
      assert(ImageCodec.channelMeans(badPng) === null)
      val jpg = ImageCodec.encodeJpeg(20, 20, 128, 128, 128)
      val jm = ImageCodec.channelMeans(jpg)
      assert(jm != null && math.abs(jm(0) - 128.0) < 12.0, s"jpeg round $i")
      assert(ImageCodec.channelMeans(badJpg) === null)
    }
  }

  test("invalid codec parameters fail fast at plan build, not per row") {
    import Multimodal.{AudioCodec, ImageCodec, VideoCodec}
    // parameter errors are CALLER bugs: they must surface as one loud
    // build-time IllegalArgumentException, not as a per-row
    // ArithmeticException / NegativeArraySizeException dressed up as a
    // task failure — or worse, as sampleFrames' silent zero-frame
    // output (i % 0 is NULL in SQL and the filter just drops it)
    intercept[IllegalArgumentException](ImageCodec.downscaleUdf(0))
    intercept[IllegalArgumentException](AudioCodec.downsampleUdf(0))
    intercept[IllegalArgumentException](AudioCodec.windowMeansUdf(-1))
    intercept[IllegalArgumentException](AudioCodec.encodePatternWavUdf(0))
    intercept[IllegalArgumentException](VideoCodec.decimateUdf(0))
    intercept[IllegalArgumentException](AudioCodec.encodeWav(10, 8000, Array.empty))
    val df = Seq((1L, "x".getBytes)).toDF("id", "blob")
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(df, "blob", frameSize = 0, stride = 1))
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(df, "blob", frameSize = 4, stride = 0))
  }

  test("stage-depth fixtures: raster-cut PNG, 8-bit WAV, bad-frame AVI") {
    import Multimodal.{AudioCodec, ImageCodec, VideoCodec}
    // each fixture decodes at METADATA depth but quarantines at its
    // modality's sample/pixel depth — the per-stage split the
    // quarantine-report gate attributes (header vs raster vs pcm vs
    // frame), pinned here byte-level before the oracle relies on it
    // raster corruption: IDAT payload zeroed, chunk structure intact
    // (truncation would fail HEADER depth too — the PNG reader's type
    // probe walks the chunk list to IEND)
    val cut = ImageCodec.encodeRasterCorruptPng(12, 9, 5, 6, 7)
    val im = ImageCodec.decodeMeta(cut)
    assert(im != null && im.width == 12 && im.height == 9 && im.format == "png")
    assert(ImageCodec.channelMeans(cut) == null)
    assert(ImageCodec.aHash(cut) == null)
    // 8-bit unsigned WAV: header-valid, PCM16 stages reject
    val w8 = AudioCodec.encodeWav8(100, 8000, 77)
    val am = AudioCodec.decodeMeta(w8)
    assert(am != null && am.bitsPerSample == 8 && am.frames == 100L &&
      am.sampleRate == 8000)
    assert(AudioCodec.channelMeans(w8) == null)
    assert(AudioCodec.peak(w8) == null)
    // bad-frame AVI: container walks, frame decode quarantines whole
    val avi = VideoCodec.encodeBadFrameAvi(5, 8, 8, 10, 60, badIdx = 2)
    val vm = VideoCodec.decodeMeta(avi)
    assert(vm != null && vm.nFrames == 5 && vm.fps == 10)
    assert(VideoCodec.frameMeans(avi) == null)
    assert(VideoCodec.frames(avi) != null) // chunk payloads still listed
  }

  test("AIFF decodes identically to WAV: big-endian PCM through the same stages") {
    import Multimodal.AudioCodec
    // the byte-order twin: same frames/values, both containers, every
    // stage must agree — meta, exact channel means, peak, and the
    // decimation transcode (which re-emits WAV from either input)
    val wav = AudioCodec.encodeWav(120, 8000, Array(1200.toShort, (-7000).toShort))
    val aiff = AudioCodec.encodeAiff(120, 8000, Array(1200.toShort, (-7000).toShort))
    val (wm, am) = (AudioCodec.decodeMeta(wav), AudioCodec.decodeMeta(aiff))
    assert(am != null)
    assert((am.sampleRate, am.channels, am.bitsPerSample, am.frames,
      am.durationMs, am.format) === (wm.sampleRate, wm.channels,
      wm.bitsPerSample, wm.frames, wm.durationMs, wm.format))
    assert(AudioCodec.channelMeans(aiff).toSeq === Seq(1200.0, -7000.0))
    assert(AudioCodec.peak(aiff).intValue === 7000)
    val ds = AudioCodec.downsample(aiff, 4)
    val dm = AudioCodec.decodeMeta(ds)
    assert(dm != null && dm.sampleRate == 2000 && dm.frames == 30L)
    assert(AudioCodec.channelMeans(ds).toSeq === Seq(1200.0, -7000.0))
    // negative samples are where a byte-order bug hides: a BE short
    // read LE flips sign/magnitude, so the -7000 assertions above are
    // the actual guard; truncated AIFF quarantines like truncated WAV
    assert(AudioCodec.decodeMeta(
      java.util.Arrays.copyOfRange(aiff, 0, 20)) == null)
  }

  test("cached writer recovers after a mid-write failure (eviction, not poison)") {
    import Multimodal.ImageCodec
    // the per-thread WRITER cache mirror of the reader-reset test: an
    // image whose pixel fetch throws mid-write must not poison the
    // cached PNG writer for every later encode on this thread — the
    // failed writer is disposed + evicted, and the next call
    // re-resolves a fresh one from the registry
    val real = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val poison: java.awt.image.RenderedImage = new java.awt.image.RenderedImage {
      import java.awt.image.{Raster, WritableRaster}
      def getSources = real.getSources
      def getProperty(name: String) = real.getProperty(name)
      def getPropertyNames = real.getPropertyNames
      def getColorModel = real.getColorModel
      def getSampleModel = real.getSampleModel
      def getWidth = real.getWidth
      def getHeight = real.getHeight
      def getMinX = real.getMinX
      def getMinY = real.getMinY
      def getNumXTiles = real.getNumXTiles
      def getNumYTiles = real.getNumYTiles
      def getMinTileX = real.getMinTileX
      def getMinTileY = real.getMinTileY
      def getTileWidth = real.getTileWidth
      def getTileHeight = real.getTileHeight
      def getTileGridXOffset = real.getTileGridXOffset
      def getTileGridYOffset = real.getTileGridYOffset
      def getTile(x: Int, y: Int): Raster =
        throw new RuntimeException("poisoned pixel fetch")
      def getData: Raster =
        throw new RuntimeException("poisoned pixel fetch")
      def getData(rect: java.awt.Rectangle): Raster =
        throw new RuntimeException("poisoned pixel fetch")
      def copyData(r: WritableRaster): WritableRaster =
        throw new RuntimeException("poisoned pixel fetch")
    }
    // warm the cache, then poison it, then prove recovery — 3 rounds so
    // a recovered-but-fragile writer would still be caught
    (1 to 3).foreach { i =>
      val ok = ImageCodec.encodePng(6 + i, 5, i, i, i) // caches a writer
      assert(ImageCodec.decodeMeta(ok) !== null, s"pre-poison round $i")
      intercept[Exception](ImageCodec.encodeVia(poison, "png"))
      val after = ImageCodec.encodeVia(real, "png")
      val m = ImageCodec.decodeMeta(after)
      assert(m != null && m.width == 8 && m.height == 8,
        s"writer did not recover after mid-write failure, round $i")
    }
  }
}
