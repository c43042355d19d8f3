package graft.multimodal

import graft.SparkTestBase

class MediaSniffSpec extends SparkTestBase {

  private val params = (5, 8, 8, 10, 1, 40, 80) // nf w h fps cut vA vB

  private def avi = {
    val (nf, w, h, fps, cut, vA, vB) = params
    Multimodal.VideoCodec.encodeSolidAvi(nf, w, h, fps, cut, vA, vB)
  }
  private def mp4 = {
    val (nf, w, h, fps, cut, vA, vB) = params
    Mp4Codec.encodeSolidMp4(nf, w, h, fps, cut, vA, vB)
  }
  private def fmp4 = {
    val (nf, w, h, fps, cut, vA, vB) = params
    Mp4Codec.encodeSolidFragmentedMp4(nf, w, h, fps, cut, vA, vB)
  }

  test("container sniff recognizes RIFF/AVI and both MP4 layouts, rejects everything else") {
    assert(MediaSniff.container(avi) == "avi")
    assert(MediaSniff.container(mp4) == "mp4")
    assert(MediaSniff.container(fmp4) == "mp4")
    assert(MediaSniff.container(null) == null)
    assert(MediaSniff.container(Array.empty[Byte]) == null)
    assert(MediaSniff.container("RIFF1234WAVE".getBytes("US-ASCII")) == null) // WAV, not AVI
    assert(MediaSniff.container("not a container at all".getBytes("UTF-8")) == null)
    assert(MediaSniff.container(
      Multimodal.ImageCodec.encodePng(8, 8, 1, 2, 3)) == null)
  }

  test("unified metadata and frame means agree across all three layouts of the same clip") {
    val metas = Seq("avi" -> avi, "mp4" -> mp4, "mp4" -> fmp4).map {
      case (expected, blob) =>
        val m = MediaSniff.decodeMeta(blob)
        assert(m != null && m.container == expected)
        m
    }
    val (nf, w, h, fps, _, _, _) = params
    metas.foreach { m =>
      assert((m.width, m.height, m.nFrames, m.rate, m.durationMs, m.codec)
        === (w, h, nf, fps, nf * 1000L / fps, "mpng"))
    }
    val means = Seq(avi, mp4, fmp4).map(MediaSniff.frameMeans(_).toSeq)
    assert(means.distinct.size == 1, s"layouts disagree: $means")
    assert(means.head === Seq(40.0, 80.0, 80.0, 80.0, 80.0))
  }

  test("a sniff match that fails to parse quarantines like the walker itself") {
    // container magic intact, body corrupt: dispatch must not turn a
    // walker-level NULL into anything else
    val cut = java.util.Arrays.copyOfRange(avi, 0, 20)
    assert(MediaSniff.container(cut) == "avi") // 12-byte magic survives
    assert(MediaSniff.decodeMeta(cut) == null) // the walker quarantines
    assert(MediaSniff.frameMeans(cut) == null)
    val mp4Cut = java.util.Arrays.copyOfRange(mp4, 0, 20)
    assert(MediaSniff.container(mp4Cut) == "mp4") // ftyp magic survives
    assert(MediaSniff.decodeMeta(mp4Cut) == null)
    assert(MediaSniff.frameMeans(mp4Cut) == null)
  }

  test("posterFrame extracts exactly frame 0 through either walker; posterHash equals the image aHash") {
    val pattern = 0x5A5A00FF12345601L
    Seq("avi", "mp4", "fmp4").foreach { c =>
      val clip = MediaSniff.encodePosterClip(pattern, 5, 10, 4, c)
      val poster = MediaSniff.posterFrame(clip)
      assert(poster != null, c)
      // frame 0 is carried byte-identical: it decodes as the pattern
      // PNG itself, so the cross-modal fingerprint is the SAME aHash
      // an image column computes
      assert(Multimodal.ImageCodec.aHash(poster) == pattern, c)
      assert(MediaSniff.posterHash(clip) == pattern, c)
    }
    // the image side of the cross-modal join: same pattern, same hash
    val img = Multimodal.ImageCodec.encodePatternPng(pattern, 4)
    assert(Multimodal.ImageCodec.aHash(img) == pattern)
    // quarantine: null/garbage/truncated-payload clips are null whole
    assert(MediaSniff.posterFrame(null) == null)
    assert(MediaSniff.posterHash("junk".getBytes("UTF-8")) == null)
    val clip = MediaSniff.encodePosterClip(pattern, 5, 10, 4, "mp4")
    val cut = java.util.Arrays.copyOfRange(clip, 0, clip.length - 5)
    assert(MediaSniff.posterFrame(cut) == null) // ranges quarantine whole
    intercept[IllegalArgumentException](
      MediaSniff.encodePosterClip(pattern, 5, 10, 4, "webm"))
  }

  test("transcodeToMp4 normalizes all three layouts to one byte-identical-payload plain MP4") {
    val (nf, w, h, fs, cut, vA, vB) = (6, 10, 8, 5, 2, 30, 70)
    val sources = Seq(
      "avi" -> Multimodal.VideoCodec.encodeSolidAvi(nf, w, h, fs, cut, vA, vB),
      "mp4" -> Mp4Codec.encodeSolidMp4(nf, w, h, fs, cut, vA, vB),
      "fmp4" -> Mp4Codec.encodeSolidFragmentedMp4(nf, w, h, fs, cut, vA, vB),
      "mdat-first" -> Mp4Codec.encodeMp4Variant(
        (0 until nf).map { i =>
          val v = if (i >= cut) vB else vA
          Multimodal.ImageCodec.encodePng(w, h, v, v, v)
        }, w, h, fs,
        useCo64 = false, version1 = false, mdatFirst = true))
    val norms = sources.map { case (name, src) =>
      val norm = MediaSniff.transcodeToMp4(src)
      assert(norm != null, name)
      val m = Mp4Codec.decodeMeta(norm)
      assert((m.width, m.height, m.nSamples, m.timescale, m.durationMs)
        === (w, h, nf, fs, nf * 1000L / fs), name)
      assert(MediaSniff.container(norm) == "mp4", name)
      name -> norm
    }
    // frame payloads survive byte-identical, so all four sources —
    // which carry the SAME gray PNG frames in four different container
    // layouts — normalize to the SAME file, byte for byte
    norms.tail.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(b, norms.head._2), n) }
    // quarantine: corrupt inputs stay null through the transcode —
    // never an empty-but-valid output
    assert(MediaSniff.transcodeToMp4(null) == null)
    assert(MediaSniff.transcodeToMp4(
      java.util.Arrays.copyOfRange(sources.head._2, 0, 20)) == null)
    // a frameless-but-valid movie (fMP4 init segment) also quarantines
    val frag = Mp4Codec.encodeSolidFragmentedMp4(2, 8, 8, 5, -1, 40, 0)
    val moovEnd = {
      var i = 4; var at = -1
      while (at < 0 && i <= frag.length - 4) {
        if (frag(i) == 'm' && frag(i + 1) == 'o' && frag(i + 2) == 'o' &&
          frag(i + 3) == 'v') at = i - 4
        i += 1
      }
      val len = ((frag(at) & 0xff) << 24) | ((frag(at + 1) & 0xff) << 16) |
        ((frag(at + 2) & 0xff) << 8) | (frag(at + 3) & 0xff)
      at + len
    }
    assert(MediaSniff.transcodeToMp4(
      java.util.Arrays.copyOfRange(frag, 0, moovEnd)) == null)
  }

  test("audio sniff + normalize: WAV/AIFF pass through, m4a demuxes, all decode identically") {
    val (frames, rate, ch, v0, v1) = (120, 8000, 2, -900, 450)
    val wav = Multimodal.AudioCodec.encodeWav(frames, rate,
      Array(v0.toShort, v1.toShort))
    val aiff = Multimodal.AudioCodec.encodeAiff(frames, rate,
      Array(v0.toShort, v1.toShort))
    val m4a = Mp4Codec.encodeSolidMp4WithAudio(0, 8, 8, 5, va = 0,
      audioFrames = frames, rate = rate, channels = ch, v0 = v0, v1 = v1)
    assert(MediaSniff.audioContainer(wav) == "wav")
    assert(MediaSniff.audioContainer(aiff) == "aiff")
    assert(MediaSniff.audioContainer(m4a) == "mp4")
    assert(MediaSniff.audioContainer("garbage bytes here".getBytes("UTF-8")) == null)
    // a VIDEO mp4 also normalizes if it carries a soun track; a
    // video-only mp4 correctly yields null at the demux stage
    assert(MediaSniff.audioToDecodable(
      Mp4Codec.encodeSolidMp4(3, 8, 8, 5, -1, 40, 0)) == null)
    Seq("wav" -> wav, "aiff" -> aiff, "m4a" -> m4a).foreach { case (name, blob) =>
      val norm = MediaSniff.audioToDecodable(blob)
      assert(norm != null, name)
      // pass-through is IDENTITY for the SPI-readable containers
      if (name != "m4a") assert(norm eq blob, name)
      val m = Multimodal.AudioCodec.decodeMeta(norm)
      assert((m.sampleRate, m.channels, m.bitsPerSample, m.frames)
        === (rate, ch, 16, frames.toLong), name)
      val means = Multimodal.AudioCodec.channelMeans(norm)
      assert((means(0), means(1)) === (v0.toDouble, v1.toDouble), name)
    }
    assert(MediaSniff.audioToDecodable(null) == null)
    assert(MediaSniff.audioToDecodable(
      java.util.Arrays.copyOfRange(m4a, 0, 20)) == null)
  }

  test("UDF path dispatches per row over a mixed column") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((0L, avi), (1L, mp4), (2L, fmp4),
      (3L, "garbage".getBytes("UTF-8")))
      .toDF("id", "blob")
      .withColumn("c", MediaSniff.containerUdf(col("blob")))
      .withColumn("meta", MediaSniff.decodeMetaUdf(col("blob")))
      .withColumn("means", MediaSniff.frameMeansUdf(col("blob")))
      .select(col("id"), col("c"), col("meta._3").as("nf"),
        col("meta._7").as("cont"), element_at(col("means"), 1).as("m0"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)).orNull)).toSeq
      === Seq((0L, "avi"), (1L, "mp4"), (2L, "mp4"), (3L, null)))
    assert(rows.take(3).map(r => (r.getInt(2), r.getString(3), r.getDouble(4))).toSeq
      === Seq((5, "avi", 40.0), (5, "mp4", 40.0), (5, "mp4", 40.0)))
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(4))
  }
}
