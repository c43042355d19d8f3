package graft.multimodal

import graft.SparkTestBase

class Mp4CodecSpec extends SparkTestBase {

  test("solid MP4 round-trips: metadata, sample count, frame means, duration") {
    // 7 samples at spc=3 → chunks of 3/3/1: the ragged tail forces TWO
    // stsc run entries, so the chunk walk is exercised beyond the
    // trivial single-run shape
    val blob = Mp4Codec.encodeSolidMp4(7, 16, 12, 10, cutIdx = 3, vA = 50, vB = 90)
    val m = Mp4Codec.decodeMeta(blob)
    assert(m != null)
    assert((m.width, m.height, m.nSamples, m.timescale, m.durationMs, m.codec)
      === (16, 12, 7, 10, 700L, "mpng"))
    val means = Mp4Codec.frameMeans(blob)
    assert(means.toSeq === Seq(50.0, 50.0, 50.0, 90.0, 90.0, 90.0, 90.0))
  }

  test("every chunk-layout shape resolves all samples (1 chunk, full runs, ragged tail)") {
    // n = 2 (one partial chunk), 3 (exactly one full chunk), 6 (two
    // full), 7 (ragged) — each a distinct stsc run encoding
    Seq(2, 3, 6, 7, 11).foreach { n =>
      val blob = Mp4Codec.encodeSolidMp4(n, 8, 8, 5, cutIdx = -1, vA = 70, vB = 0)
      val m = Mp4Codec.decodeMeta(blob)
      assert(m != null && m.nSamples == n, s"n=$n")
      val fs = Mp4Codec.samples(blob)
      assert(fs.length == n, s"n=$n")
      // every resolved byte range must be a decodable PNG of the right fill
      val means = Mp4Codec.frameMeans(blob)
      assert(means.toSeq === Seq.fill(n)(70.0), s"n=$n")
    }
  }

  test("decimate keeps every stride-th sample and re-encodes a parseable container") {
    val blob = Mp4Codec.encodeSolidMp4(7, 8, 8, 10, cutIdx = 2, vA = 30, vB = 80)
    val small = Mp4Codec.decimate(blob, 2)
    val m = Mp4Codec.decodeMeta(small)
    assert(m != null && m.nSamples == 4 && m.durationMs == 400L)
    // kept samples are original 0,2,4,6 → fills 30,80,80,80
    assert(Mp4Codec.frameMeans(small).toSeq === Seq(30.0, 80.0, 80.0, 80.0))
  }

  test("pattern MP4 frameMeans recover the pattern exactly") {
    val pattern = 0x5A5A00FF12345601L
    val blob = Mp4Codec.encodePatternMp4(pattern, 8, 8, 10, hi = 200, lo = 40)
    val means = Mp4Codec.frameMeans(blob)
    assert(means.length == 64)
    (0 until 64).foreach { i =>
      val expected = if (((pattern >>> i) & 1L) != 0L) 200.0 else 40.0
      assert(means(i) === expected, s"sample $i")
    }
  }

  test("co64 offsets and version-1 headers parse identically to stco/v0") {
    val frames = (0 until 5).map(i =>
      Multimodal.ImageCodec.encodePng(8, 8, 10 * i, 10 * i, 10 * i))
    val variants = Seq(
      Mp4Codec.encodeMp4Variant(frames, 8, 8, 4, useCo64 = true, version1 = false),
      Mp4Codec.encodeMp4Variant(frames, 8, 8, 4, useCo64 = false, version1 = true),
      Mp4Codec.encodeMp4Variant(frames, 8, 8, 4, useCo64 = true, version1 = true))
    variants.zipWithIndex.foreach { case (blob, vi) =>
      val m = Mp4Codec.decodeMeta(blob)
      assert(m != null, s"variant $vi")
      assert((m.width, m.height, m.nSamples, m.timescale, m.durationMs)
        === (8, 8, 5, 4, 1250L), s"variant $vi")
      assert(Mp4Codec.frameMeans(blob).toSeq ===
        Seq(0.0, 10.0, 20.0, 30.0, 40.0), s"variant $vi")
    }
  }

  test("stage split: truncated mdat keeps moov metadata, quarantines samples") {
    // moov precedes mdat in the fixture layout, so cutting the tail
    // leaves the metadata readable while the resolved sample ranges
    // fall outside the blob — the container analogue of the image
    // codec's header-vs-raster split
    val blob = Mp4Codec.encodeSolidMp4(5, 8, 8, 5, cutIdx = -1, vA = 60, vB = 0)
    val cut = java.util.Arrays.copyOfRange(blob, 0, blob.length - 5)
    val meta = Mp4Codec.decodeMeta(cut)
    assert(meta != null && meta.nSamples == 5) // meta survives
    assert(Mp4Codec.samples(cut) == null)
    assert(Mp4Codec.frameMeans(cut) == null)
  }

  test("header-depth corruption quarantines everything as NULL, never throws") {
    val blob = Mp4Codec.encodeSolidMp4(4, 8, 8, 5, cutIdx = -1, vA = 60, vB = 0)
    val headerCut = java.util.Arrays.copyOfRange(blob, 0, 20) // inside ftyp
    assert(Mp4Codec.decodeMeta(headerCut) == null)
    assert(Mp4Codec.frameMeans(headerCut) == null)
    assert(Mp4Codec.decodeMeta("not an mp4 at all".getBytes("UTF-8")) == null)
    assert(Mp4Codec.decodeMeta(Array.empty[Byte]) == null)
    assert(Mp4Codec.decodeMeta(null) == null)
  }

  test("adversarial shapes quarantine instead of OOM/SOE/looping") {
    def boxBytes(tpe: String, body: Array[Byte]): Array[Byte] = {
      val len = 8 + body.length
      Array(((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
        tpe.getBytes("US-ASCII") ++ body
    }
    val ftyp = boxBytes("ftyp", "isom".getBytes ++ Array.fill(4)(0.toByte))
    // (1) deep nesting: 1000 nested moov headers would StackOverflowError
    // an uncapped recursive walker — SOE is an Error and escapes the
    // Exception quarantine, so the depth cap must reject first
    val deep = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(ftyp)
      val levels = 1000
      val innerLen = 8 * levels
      (0 until levels).foreach { i =>
        val len = innerLen - 8 * i
        bos.write(Array(((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
          ((len >> 8) & 0xff).toByte, (len & 0xff).toByte))
        bos.write("moov".getBytes("US-ASCII"))
      }
      bos.toByteArray
    }
    assert(Mp4Codec.decodeMeta(deep) == null)
    // (2) crafted uniform stsz declaring 2^31 samples: believing the
    // count would allocate gigabytes before any range check
    val bomb = {
      val stsz = boxBytes("stsz", Array.fill(4)(0.toByte) ++
        Array(0, 0, 0, 1).map(_.toByte) ++ // uniform size 1
        Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte)) // count = 2^31-1
      val stbl = boxBytes("stbl", stsz)
      val minf = boxBytes("minf", stbl)
      val hdlr = boxBytes("hdlr", Array.fill(8)(0.toByte) ++
        "vide".getBytes ++ Array.fill(12)(0.toByte))
      val mdia = boxBytes("mdia", hdlr ++ minf)
      val trak = boxBytes("trak", mdia)
      ftyp ++ boxBytes("moov", trak)
    }
    assert(Mp4Codec.decodeMeta(bomb) == null)
    // (3) zero-size box loop: a size-below-header box must be rejected,
    // not walked forever
    val loop = ftyp ++ Array(0, 0, 0, 7).map(_.toByte) ++ "moov".getBytes
    assert(Mp4Codec.decodeMeta(loop) == null)
  }

  test("single-byte fuzz across the whole container never throws") {
    val blob = Mp4Codec.encodeSolidMp4(4, 8, 8, 5, cutIdx = 1, vA = 60, vB = 90)
    // flip one byte at a stride across the file: every outcome is legal
    // (decode, partial-meta, or NULL) as long as nothing throws
    (0 until blob.length by 7).foreach { i =>
      val fuzz = blob.clone()
      fuzz(i) = (fuzz(i) ^ 0x5a).toByte
      Mp4Codec.decodeMeta(fuzz)
      Mp4Codec.frameMeans(fuzz)
      Mp4Codec.samples(fuzz)
    }
    // truncate at every 13th length: same contract
    (0 until blob.length by 13).foreach { n =>
      val cut = java.util.Arrays.copyOfRange(blob, 0, n)
      Mp4Codec.decodeMeta(cut)
      Mp4Codec.frameMeans(cut)
    }
  }

  test("UDF path: encode → meta/means/decimate through Spark columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, 4, 30), (2L, 7, 90), (3L, 5, 150)).toDF("id", "nf", "v")
      .withColumn("blob", Mp4Codec.encodeSolidMp4Udf(
        col("nf"), lit(8), lit(8), lit(10), lit(-1), col("v"), lit(0)))
      .withColumn("meta", Mp4Codec.decodeMetaUdf(col("blob")))
      .withColumn("means", Mp4Codec.frameMeansUdf(col("blob")))
      .withColumn("small", Mp4Codec.decimateUdf(2)(col("blob")))
      .withColumn("smeta", Mp4Codec.decodeMetaUdf(col("small")))
      .select(col("id"), col("meta._3").as("n"), col("meta._4").as("ts"),
        col("meta._5").as("dur"), element_at(col("means"), 1).as("m0"),
        col("smeta._3").as("dn"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getLong(3), r.getDouble(4), r.getInt(5))).toSeq === Seq(
      (1L, 4, 10, 400L, 30.0, 2),
      (2L, 7, 10, 700L, 90.0, 4),
      (3L, 5, 10, 500L, 150.0, 3)))
    // parameter errors fail fast at build, not per row
    intercept[IllegalArgumentException](Mp4Codec.decimateUdf(0))
  }

  test("non-faststart layout (mdat before moov) parses identically") {
    // most capture tools write mdat FIRST and append moov at the end;
    // the walker must find the metadata wherever it sits, and the
    // absolute chunk offsets resolve the same samples
    val frames = (0 until 5).map(i =>
      Multimodal.ImageCodec.encodePng(8, 8, 30 * i, 30 * i, 30 * i))
    val late = Mp4Codec.encodeMp4Variant(frames, 8, 8, 4,
      useCo64 = false, version1 = false, mdatFirst = true)
    val m = Mp4Codec.decodeMeta(late)
    assert(m != null)
    assert((m.width, m.height, m.nSamples, m.timescale, m.durationMs)
      === (8, 8, 5, 4, 1250L))
    assert(Mp4Codec.frameMeans(late).toSeq ===
      Seq(0.0, 30.0, 60.0, 90.0, 120.0))
    // and the tail-cut failure mode INVERTS vs moov-first: cutting the
    // file tail now removes the METADATA (moov is last), so the blob
    // quarantines at container depth, not sample depth
    val cut = java.util.Arrays.copyOfRange(late, 0, late.length - 5)
    assert(Mp4Codec.decodeMeta(cut) == null)
  }

  test("fragmented MP4 (moof/trun) parses identically to the plain layout") {
    // the DASH/HLS shape: empty stbl, mvex/trex defaults, samples in
    // moof+mdat pairs with default-base-is-moof trun offsets — the
    // walker must recover the same metadata, duration (from fragment
    // sample durations: mdhd says 0), and sample payloads
    Seq(1, 2, 3, 5, 7).foreach { n =>
      val plain = Mp4Codec.encodeSolidMp4(n, 10, 8, 5, cutIdx = 1, vA = 30, vB = 70)
      val frag = Mp4Codec.encodeSolidFragmentedMp4(n, 10, 8, 5, cutIdx = 1,
        vA = 30, vB = 70)
      val pm = Mp4Codec.decodeMeta(plain)
      val fm = Mp4Codec.decodeMeta(frag)
      assert(fm != null, s"n=$n")
      assert((fm.width, fm.height, fm.nSamples, fm.timescale, fm.durationMs,
        fm.codec) === (pm.width, pm.height, pm.nSamples, pm.timescale,
        pm.durationMs, pm.codec), s"n=$n")
      assert(Mp4Codec.frameMeans(frag).toSeq ===
        Mp4Codec.frameMeans(plain).toSeq, s"n=$n")
    }
  }

  test("fragmented MP4 is prefix-valid: cutting after a whole fragment keeps the prefix") {
    // fragments are the format's append unit — a file cut at a
    // fragment boundary is a VALID shorter movie (how real streaming
    // tools treat partial downloads); a cut inside the last mdat
    // keeps metadata for the fragments already walked but quarantines
    // the sample payloads whose ranges point past the cut
    val frames = (0 until 6).map(i =>
      Multimodal.ImageCodec.encodePng(8, 8, 20 * i, 20 * i, 20 * i))
    val blob = Mp4Codec.encodeFragmentedMp4(frames, 8, 8, 5, samplesPerFragment = 2)
    // locate the last mdat: cut 5 bytes into its payload
    val cut = java.util.Arrays.copyOfRange(blob, 0, blob.length - 5)
    val m = Mp4Codec.decodeMeta(cut)
    assert(m != null && m.nSamples == 6) // all trun entries walked
    assert(Mp4Codec.samples(cut) == null) // last range past the cut
    assert(Mp4Codec.frameMeans(cut) == null)
    // cut at the exact end of fragment 2 (before fragment 3's moof):
    // a valid 4-sample prefix movie
    val lastMoof = {
      var at = -1; var i = blob.length - 8
      while (at < 0 && i >= 0) {
        if (blob(i + 4) == 'm' && blob(i + 5) == 'o' && blob(i + 6) == 'o' &&
          blob(i + 7) == 'f') at = i
        i -= 1
      }
      at
    }
    assert(lastMoof > 0)
    val prefix = java.util.Arrays.copyOfRange(blob, 0, lastMoof)
    val pm = Mp4Codec.decodeMeta(prefix)
    assert(pm != null && pm.nSamples == 4 && pm.durationMs == 800L)
    assert(Mp4Codec.frameMeans(prefix).toSeq ===
      Seq(0.0, 20.0, 40.0, 60.0))
  }

  test("fragmented fuzz: byte flips and truncations never throw") {
    val blob = Mp4Codec.encodeSolidFragmentedMp4(5, 8, 8, 5, cutIdx = 2,
      vA = 40, vB = 90)
    (0 until blob.length by 7).foreach { i =>
      val fuzz = blob.clone()
      fuzz(i) = (fuzz(i) ^ 0x5a).toByte
      Mp4Codec.decodeMeta(fuzz); Mp4Codec.frameMeans(fuzz)
    }
    (0 until blob.length by 13).foreach { nn =>
      val cut = java.util.Arrays.copyOfRange(blob, 0, nn)
      Mp4Codec.decodeMeta(cut); Mp4Codec.frameMeans(cut)
    }
    // crafted trun declaring 2^20+ samples with no sizes anywhere must
    // quarantine at the cap/size checks, not allocate or loop
    def be(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftypLen = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    val moovLen = ((blob(ftypLen) & 0xff) << 24) | ((blob(ftypLen + 1) & 0xff) << 16) |
      ((blob(ftypLen + 2) & 0xff) << 8) | (blob(ftypLen + 3) & 0xff)
    val head = java.util.Arrays.copyOfRange(blob, 0, ftypLen + moovLen)
    val trunBomb = be(8 + 4 + 8) ++ "trun".getBytes ++
      be(0) ++ be(0x7fffffff) // flags 0 (no sizes), count 2^31-1
    val tfhd = be(8 + 4 + 4) ++ "tfhd".getBytes ++
      Array(0.toByte, 2.toByte, 0.toByte, 0.toByte) ++ be(1) // base-is-moof
    val traf = be(8 + tfhd.length + trunBomb.length) ++ "traf".getBytes ++
      tfhd ++ trunBomb
    val moof = be(8 + traf.length) ++ "moof".getBytes ++ traf
    assert(Mp4Codec.decodeMeta(head ++ moof) == null)
  }

  test("property: every layout variant round-trips arbitrary clips identically") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic sampling (the PropertySpec idiom): arbitrary frame
    // counts, geometry, fps and fill schedules through all five
    // container layouts — plain, co64, version-1, non-faststart,
    // fragmented at 1..4 samples per fragment — must agree on
    // metadata, duration and every recovered frame mean
    val gen = for {
      n <- Gen.choose(1, 12)
      w <- Gen.choose(4, 20)
      h <- Gen.choose(4, 20)
      fps <- Gen.choose(1, 30)
      fills <- Gen.listOfN(n, Gen.choose(0, 255))
      spf <- Gen.choose(1, 4)
    } yield (n, w, h, fps, fills, spf)
    // deterministic seed walk — the PropertySpec samples() idiom
    var seed = Seed(42L)
    val cases = (1 to 25).flatMap { _ =>
      val v = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
    assert(cases.size >= 12, "generator produced too few cases")
    cases.zipWithIndex.foreach { case ((n, w, h, fps, fills, spf), i) =>
      val frames = fills.map(v => Multimodal.ImageCodec.encodePng(w, h, v, v, v))
      val layouts = Seq(
        "plain" -> Mp4Codec.encodeMp4(frames, w, h, fps),
        "co64" -> Mp4Codec.encodeMp4Variant(frames, w, h, fps,
          useCo64 = true, version1 = false),
        "v1" -> Mp4Codec.encodeMp4Variant(frames, w, h, fps,
          useCo64 = false, version1 = true),
        "mdatFirst" -> Mp4Codec.encodeMp4Variant(frames, w, h, fps,
          useCo64 = false, version1 = false, mdatFirst = true),
        "fragmented" -> Mp4Codec.encodeFragmentedMp4(frames, w, h, fps, spf))
      layouts.foreach { case (name, blob) =>
        val m = Mp4Codec.decodeMeta(blob)
        assert(m != null, s"case $i $name")
        assert((m.width, m.height, m.nSamples, m.timescale, m.durationMs) ===
          (w, h, n, fps, n * 1000L / fps), s"case $i $name")
        assert(Mp4Codec.frameMeans(blob).toSeq === fills.map(_.toDouble),
          s"case $i $name")
      }
    }
  }

  test("zero-entry stsc under a nonzero stsz quarantines at metadata depth, never throws") {
    // a header-valid MP4 whose stsc declares ZERO runs while stsz
    // declares samples and stco declares chunks is internally
    // inconsistent: nothing places the samples. Believing it would
    // walk stscSamplesPerChunk(0) off the empty array — the uncaught
    // AIOOBE class the resolve-time quarantine must never leak.
    val blob = Mp4Codec.encodeSolidMp4(4, 8, 8, 5, cutIdx = -1, vA = 60, vB = 0)
    val at = indexOfFourcc(blob, "stsc")
    assert(at > 0)
    val bad = blob.clone()
    // entry count sits after the 8-byte box header + 4-byte vf
    bad(at + 12) = 0; bad(at + 13) = 0; bad(at + 14) = 0; bad(at + 15) = 0
    assert(Mp4Codec.decodeMeta(bad) == null) // corrupt-table depth
    assert(Mp4Codec.samples(bad) == null)
    assert(Mp4Codec.frameMeans(bad) == null)
    assert(Mp4Codec.decimate(bad, 2) == null)
  }

  test("co64 offset near Long.MaxValue fails the bounds check instead of overflowing past it") {
    // off + size would wrap negative and sneak past a naive
    // `off + size > blob.length` test into a throwing copyOfRange;
    // the overflow-safe form (size > blob.length - off) must
    // quarantine at sample depth with the metadata intact
    val frames = (0 until 3).map(_ => Multimodal.ImageCodec.encodePng(8, 8, 50, 50, 50))
    val blob = Mp4Codec.encodeMp4Variant(frames, 8, 8, 5, useCo64 = true,
      version1 = false)
    val at = indexOfFourcc(blob, "co64")
    assert(at > 0)
    val bad = blob.clone()
    // first 64-bit offset sits after header(8) + vf(4) + count(4)
    val huge = Array(0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xf0).map(_.toByte)
    System.arraycopy(huge, 0, bad, at + 16, 8)
    assert(Mp4Codec.decodeMeta(bad) != null) // moov still reads
    assert(Mp4Codec.samples(bad) == null) // sample-depth quarantine
    assert(Mp4Codec.frameMeans(bad) == null)
    assert(Mp4Codec.decimate(bad, 2) == null)
  }

  test("fMP4 init segment (zero samples) reads as metadata but decimate quarantines") {
    // a DASH init segment is ftyp + moov with an EMPTY stbl and no
    // fragments: spec-valid metadata over zero samples. decimate has
    // nothing to re-encode — it must return null per row, not throw
    // encodeMp4's require out of the UDF
    val full = Mp4Codec.encodeSolidFragmentedMp4(4, 8, 8, 5, cutIdx = -1,
      vA = 60, vB = 0)
    val moovAt = indexOfFourcc(full, "moov")
    val moovLen = be32At(full, moovAt)
    val init = java.util.Arrays.copyOfRange(full, 0, moovAt + moovLen)
    val m = Mp4Codec.decodeMeta(init)
    assert(m != null && m.nSamples == 0 && m.durationMs == 0L)
    assert(Mp4Codec.samples(init).length == 0)
    assert(Mp4Codec.frameMeans(init).length == 0)
    assert(Mp4Codec.decimate(init, 2) == null)
  }

  test("fMP4 duration second witness: mdhd agreeing with the fragment sum reads, disagreeing quarantines") {
    // some muxers write the final fragment-summed duration into mdhd
    // (legal, must parse); a DIFFERENT nonzero value means one of the
    // two duration tables is corrupt — prefer quarantine over trusting
    // either, mirroring the stts/stsz sample-count rule
    val n = 5
    val blob = Mp4Codec.encodeSolidFragmentedMp4(n, 8, 8, 5, cutIdx = -1,
      vA = 60, vB = 0)
    val mdhdAt = indexOfFourcc(blob, "mdhd")
    assert(mdhdAt > 0)
    def withDuration(ticks: Int): Array[Byte] = {
      val b = blob.clone()
      // v0 mdhd: header(8) + vf(4) + creation(4) + mod(4) + timescale(4),
      // duration at +24
      b(mdhdAt + 24) = ((ticks >> 24) & 0xff).toByte
      b(mdhdAt + 25) = ((ticks >> 16) & 0xff).toByte
      b(mdhdAt + 26) = ((ticks >> 8) & 0xff).toByte
      b(mdhdAt + 27) = (ticks & 0xff).toByte
      b
    }
    val agreeing = Mp4Codec.decodeMeta(withDuration(n)) // = fragment sum
    assert(agreeing != null && agreeing.durationMs == n * 1000L / 5)
    assert(Mp4Codec.decodeMeta(withDuration(n + 3)) == null) // corrupt
    assert(Mp4Codec.frameMeans(withDuration(n + 3)) == null)
  }

  test("adversarial 64-bit mdhd duration quarantines instead of overflowing durationMs") {
    val frames = (0 until 3).map(_ => Multimodal.ImageCodec.encodePng(8, 8, 40, 40, 40))
    val blob = Mp4Codec.encodeMp4Variant(frames, 8, 8, 5, useCo64 = false,
      version1 = true)
    val mdhdAt = indexOfFourcc(blob, "mdhd")
    val bad = blob.clone()
    // v1 mdhd: header(8) + vf(4) + creation(8) + mod(8) + timescale(4),
    // 64-bit duration at +32; Long.MaxValue * 1000 would wrap garbage
    val huge = Array(0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    System.arraycopy(huge, 0, bad, mdhdAt + 32, 8)
    assert(Mp4Codec.decodeMeta(bad) == null)
    assert(Mp4Codec.frameMeans(bad) == null)
  }

  test("tfhd with neither base flag anchors on the previous traf's data end (ISO 14496-12 §8.8.7)") {
    val s0 = Multimodal.ImageCodec.encodePng(8, 8, 30, 30, 30)
    val s1 = Multimodal.ImageCodec.encodePng(8, 8, 90, 90, 90)
    def be(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def boxB(tpe: String, body: Array[Byte]): Array[Byte] =
      be(8 + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    def fullB(tpe: String, flags: Int, body: Array[Byte]): Array[Byte] =
      boxB(tpe, Array(0.toByte, ((flags >> 16) & 0xff).toByte,
        ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++ body)
    // ftyp + moov (empty stbl + mvex/trex track 1) from the encoder
    val donor = Mp4Codec.encodeSolidFragmentedMp4(1, 8, 8, 5, cutIdx = -1,
      vA = 30, vB = 0)
    val moovAt = indexOfFourcc(donor, "moov")
    val head = java.util.Arrays.copyOfRange(donor, 0,
      moovAt + be32At(donor, moovAt))
    // one moof, TWO trafs for track 1: traf1 anchors default-base-is-
    // moof with an explicit trun data_offset; traf2 sets NEITHER base
    // flag and its trun omits data_offset, so its sample can only be
    // found through the spec's previous-traf-data-end default
    val mfhd = fullB("mfhd", 0, be(1))
    val tfhd1 = fullB("tfhd", 0x020000, be(1))
    def traf1(dataOff: Int) = boxB("traf",
      tfhd1 ++ fullB("trun", 0x201, be(1) ++ be(dataOff) ++ be(s0.length)))
    val traf2 = boxB("traf",
      fullB("tfhd", 0, be(1)) ++ fullB("trun", 0x200, be(1) ++ be(s1.length)))
    val moofLen = boxB("moof", mfhd ++ traf1(0) ++ traf2).length
    val moof = boxB("moof", mfhd ++ traf1(moofLen + 8) ++ traf2)
    val blob = head ++ moof ++ boxB("mdat", s0 ++ s1)
    val m = Mp4Codec.decodeMeta(blob)
    assert(m != null && m.nSamples == 2)
    assert(m.durationMs == 2 * 1000L / 5) // trex default 1 tick/sample
    assert(Mp4Codec.frameMeans(blob).toSeq === Seq(30.0, 90.0))
    // …and a flags-less traf AFTER a FOREIGN traf (whose truns the
    // walker skips, so its data end is unknowable) must quarantine
    // rather than guess an anchor and resolve wrong ranges
    val foreignTraf = boxB("traf",
      fullB("tfhd", 0x020000, be(2)) ++ // track 2: not the vide track
        fullB("trun", 0x201, be(1) ++ be(moofLen + 8) ++ be(s0.length)))
    val moofLen2 = boxB("moof", mfhd ++ foreignTraf ++ traf2).length
    assert(moofLen2 == moofLen) // same fixed-width boxes, same size
    val blob2 = head ++ boxB("moof", mfhd ++ foreignTraf ++ traf2) ++
      boxB("mdat", s0 ++ s1)
    assert(Mp4Codec.decodeMeta(blob2) == null)
    assert(Mp4Codec.frameMeans(blob2) == null)
  }

  test("a second trun without data_offset continues at the previous trun's data end") {
    // one traf, two truns: the first anchors via an explicit
    // data_offset, the second omits it and must start where the first
    // trun's samples ended (the `running` chain) — the multi-trun
    // shape real muxers emit for mixed sample-flag runs
    val s0 = Multimodal.ImageCodec.encodePng(8, 8, 20, 20, 20)
    val s1 = Multimodal.ImageCodec.encodePng(8, 8, 80, 80, 80)
    def be(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def boxB(tpe: String, body: Array[Byte]): Array[Byte] =
      be(8 + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    def fullB(tpe: String, flags: Int, body: Array[Byte]): Array[Byte] =
      boxB(tpe, Array(0.toByte, ((flags >> 16) & 0xff).toByte,
        ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++ body)
    val donor = Mp4Codec.encodeSolidFragmentedMp4(1, 8, 8, 5, cutIdx = -1,
      vA = 20, vB = 0)
    val moovAt = indexOfFourcc(donor, "moov")
    val head = java.util.Arrays.copyOfRange(donor, 0,
      moovAt + be32At(donor, moovAt))
    val mfhd = fullB("mfhd", 0, be(1))
    val tfhd = fullB("tfhd", 0x020000, be(1))
    def traf(dataOff: Int) = boxB("traf",
      tfhd ++ fullB("trun", 0x201, be(1) ++ be(dataOff) ++ be(s0.length)) ++
        fullB("trun", 0x200, be(1) ++ be(s1.length))) // no offset: running
    val moofLen = boxB("moof", mfhd ++ traf(0)).length
    val blob = head ++ boxB("moof", mfhd ++ traf(moofLen + 8)) ++
      boxB("mdat", s0 ++ s1)
    val m = Mp4Codec.decodeMeta(blob)
    assert(m != null && m.nSamples == 2)
    assert(Mp4Codec.frameMeans(blob).toSeq === Seq(20.0, 80.0))
  }

  test("audio demux: the soun track extracts as a WAV decoding to the source PCM") {
    // both QuickTime PCM16 byte orders, mono and stereo: the demuxed
    // WAV must decode (via the ordinary AudioCodec path) to exactly
    // the constant fills the fixture wrote, while the VIDEO view of
    // the same blob stays exactly what a single-track file gives
    Seq((1, false), (2, false), (1, true), (2, true)).foreach { case (ch, be) =>
      val blob = Mp4Codec.encodeSolidMp4WithAudio(4, 8, 8, 5, va = 90,
        audioFrames = 160, rate = 8000, channels = ch, v0 = -1234, v1 = 777,
        audioBigEndian = be)
      val label = s"ch=$ch be=$be"
      // video view: unchanged by the second trak
      val vm = Mp4Codec.decodeMeta(blob)
      assert(vm != null && vm.nSamples == 4 && vm.width == 8, label)
      assert(Mp4Codec.frameMeans(blob).toSeq === Seq.fill(4)(90.0), label)
      // audio view
      val am = Mp4Codec.decodeAudioMeta(blob)
      assert(am != null, label)
      assert((am.channels, am.bits, am.sampleRate, am.nSamples, am.durationMs,
        am.codec) === (ch, 16, 8000, 160, 20L, if (be) "twos" else "sowt"), label)
      val wav = Mp4Codec.extractAudioWav(blob)
      assert(wav != null, label)
      val wm = Multimodal.AudioCodec.decodeMeta(wav)
      assert((wm.sampleRate, wm.channels, wm.bitsPerSample, wm.frames)
        === (8000, ch, 16, 160L), label)
      val means = Multimodal.AudioCodec.channelMeans(wav)
      assert(means(0) === -1234.0, label)
      if (ch == 2) assert(means(1) === 777.0, label)
    }
  }

  test("audio demux: audio-only (.m4a-style) files read on the audio view, null on the video view") {
    val blob = Mp4Codec.encodeSolidMp4WithAudio(0, 8, 8, 5, va = 0,
      audioFrames = 80, rate = 4000, channels = 1, v0 = 555, v1 = 0)
    assert(Mp4Codec.decodeMeta(blob) == null) // no vide trak at all
    val am = Mp4Codec.decodeAudioMeta(blob)
    assert(am != null && am.nSamples == 80 && am.sampleRate == 4000 &&
      am.durationMs == 20L)
    val wav = Mp4Codec.extractAudioWav(blob)
    assert(Multimodal.AudioCodec.channelMeans(wav)(0) === 555.0)
  }

  test("audio demux quarantines: tail cut kills samples not metadata; non-PCM codec is null") {
    val blob = Mp4Codec.encodeSolidMp4WithAudio(3, 8, 8, 5, va = 50,
      audioFrames = 100, rate = 8000, channels = 1, v0 = 1000, v1 = 0)
    // the audio chunk is the mdat TAIL, so a 5-byte tail cut leaves
    // video samples whole but the audio ranges out of blob
    val cut = java.util.Arrays.copyOfRange(blob, 0, blob.length - 5)
    assert(Mp4Codec.decodeAudioMeta(cut) != null) // moov metadata reads
    assert(Mp4Codec.extractAudioWav(cut) == null) // sample-depth quarantine
    assert(Mp4Codec.frameMeans(cut) != null)      // video payload intact
    // a non-PCM sample entry (a real corpus's AAC) must be metadata-
    // readable but extraction-null: patch the fourcc to 'mp4a'
    val at = indexOfFourcc(blob, "sowt")
    assert(at > 0)
    val aac = blob.clone()
    System.arraycopy("mp4a".getBytes("US-ASCII"), 0, aac, at + 4, 4)
    val am = Mp4Codec.decodeAudioMeta(aac)
    assert(am != null && am.codec == "mp4a")
    assert(Mp4Codec.extractAudioWav(aac) == null)
    // header-depth corruption: everything null, nothing thrown
    val headerCut = java.util.Arrays.copyOfRange(blob, 0, 20)
    assert(Mp4Codec.decodeAudioMeta(headerCut) == null)
    assert(Mp4Codec.extractAudioWav(headerCut) == null)
    // fuzz both views together
    (0 until blob.length by 11).foreach { i =>
      val fz = blob.clone(); fz(i) = (fz(i) ^ 0x5a).toByte
      Mp4Codec.decodeAudioMeta(fz); Mp4Codec.extractAudioWav(fz)
    }
  }

  test("streaming cursor decode equals materialize-then-decode on every sample") {
    // frameMeans streams each sample zero-copy out of the blob;
    // samples() materializes copies — the two paths must agree
    // exactly, pinning that the lazy refactor changed memory shape,
    // not behavior (plain and fragmented layouts)
    Seq(
      Mp4Codec.encodeSolidMp4(7, 10, 8, 5, cutIdx = 3, vA = 30, vB = 70),
      Mp4Codec.encodeSolidFragmentedMp4(7, 10, 8, 5, cutIdx = 3, vA = 30, vB = 70)
    ).foreach { blob =>
      val streamed = Mp4Codec.frameMeans(blob)
      val materialized = Mp4Codec.samples(blob)
        .map(f => Multimodal.ImageCodec.channelMeans(f).head)
      assert(streamed.toSeq === materialized.toSeq)
    }
  }

  private def indexOfFourcc(blob: Array[Byte], tpe: String): Int = {
    val t = tpe.getBytes("US-ASCII")
    var i = 4
    var at = -1
    while (at < 0 && i <= blob.length - 4) {
      if (blob(i) == t(0) && blob(i + 1) == t(1) && blob(i + 2) == t(2) &&
        blob(i + 3) == t(3)) at = i - 4 // box START (size precedes fourcc)
      i += 1
    }
    at
  }

  private def be32At(blob: Array[Byte], at: Int): Int =
    ((blob(at) & 0xff) << 24) | ((blob(at + 1) & 0xff) << 16) |
      ((blob(at + 2) & 0xff) << 8) | (blob(at + 3) & 0xff)

  test("first vide track is pinned; a foreign track does not overwrite it") {
    // splice a second trak (handler "soun", no sample tables) AFTER the
    // video trak inside moov: the walker must keep the first vide
    // track's tables — mirroring the AVI walker's first-vids pinning
    val blob = Mp4Codec.encodeSolidMp4(3, 8, 8, 5, cutIdx = -1, vA = 45, vB = 0)
    def be(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val hdlrSoun = be(8 + 4 + 4 + 4 + 12) ++ "hdlr".getBytes ++
      Array.fill(4)(0.toByte) ++ Array.fill(4)(0.toByte) ++
      "soun".getBytes ++ Array.fill(12)(0.toByte)
    val mdia2 = be(8 + hdlrSoun.length) ++ "mdia".getBytes ++ hdlrSoun
    val trak2 = be(8 + mdia2.length) ++ "trak".getBytes ++ mdia2
    // locate moov (second top-level box, right after ftyp)
    val ftypLen = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    val moovStart = ftypLen
    val moovLen = ((blob(moovStart) & 0xff) << 24) | ((blob(moovStart + 1) & 0xff) << 16) |
      ((blob(moovStart + 2) & 0xff) << 8) | (blob(moovStart + 3) & 0xff)
    val moovEnd = moovStart + moovLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(blob, 0, moovStart)
    out.write(be(moovLen + trak2.length)); out.write("moov".getBytes)
    out.write(blob, moovStart + 8, moovLen - 8)
    out.write(trak2)
    out.write(blob, moovEnd, blob.length - moovEnd)
    // NOTE: stco offsets now point 8 + trak2.length bytes short — but
    // the ranges still land inside the (unchanged-size) mdat region?
    // No: the file GREW by trak2.length, so the old absolute offsets
    // now point into the moov tail — range-valid but byte-shifted.
    // That is fine for THIS test: we only assert the committed track
    // is the vide one (meta), not sample content.
    val m = Mp4Codec.decodeMeta(out.toByteArray)
    assert(m != null && m.nSamples == 3 && m.codec == "mpng" && m.width == 8)
  }
}
