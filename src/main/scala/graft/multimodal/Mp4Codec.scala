package graft.multimodal

/** REAL MP4 / ISO-BMFF container codec, pure JVM (public spec:
  * ISO/IEC 14496-12 "ISO base media file format"). The dominant
  * real-corpus video container: a box tree (`ftyp` + `moov` movie
  * header + `mdat` sample payloads) where the `stbl` sample tables —
  * `stsz` (sample sizes), `stsc` (samples-per-chunk runs), `stco`/
  * `co64` (chunk offsets), `stts` (sample timing) — map every stored
  * sample to an absolute byte range. The walker below parses any
  * spec-shaped MP4's track geometry, duration, sample count, and
  * codec fourcc, resolves the per-sample byte ranges through the
  * three-table chunk walk, and feeds the stored samples through the
  * same frameMeans → temporal-hash chain as [[Multimodal.VideoCodec]]
  * (the RIFF/AVI walker this object mirrors).
  *
  * The fixture encoder writes Motion-PNG samples (fourcc `mpng`, one
  * JDK-decodable PNG per sample) across MULTI-SAMPLE CHUNKS, so the
  * stsc/stco resolution is genuinely exercised — a single-chunk
  * layout would never catch a broken run walk. Both layers are real,
  * parseable formats; what the JDK does not ship is an interframe
  * codec (H.264 etc.) — swapping one in (JNI/javacv) replaces only
  * the per-sample byte→pixels step, not the container walk or the
  * dataflow.
  *
  * Same contract as every codec in [[Multimodal]]: per-row byte→value
  * UDFs that run inside the scan projection, never shuffle, and
  * parallelize per partition; undecodable bytes become NULL
  * (quarantine is the caller's filter), never exceptions. The walk is
  * depth-capped (a crafted tree of nested containers must not
  * StackOverflowError past the Exception quarantine), every declared
  * count/size is bounds-checked against the bytes actually present
  * BEFORE allocation (a crafted stsz count of 2^31 must not OOM the
  * executor), and every resolved sample range must lie inside the
  * blob (a truncated mdat quarantines at sample depth while the moov
  * metadata — which precedes it — still reads, mirroring the image
  * codec's header-vs-raster stage split).
  */
object Mp4Codec {

  // Sample payloads round-trip through javax.imageio (Motion-PNG);
  // apply the memory-backed-stream setting (see [[Multimodal.ImageCodec]])
  // even when an MP4 UDF is the first codec touched in the executor JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded container metadata, or null for bytes that are not a
    * spec-shaped MP4. `durationMs` = mediaDuration * 1000 / timescale
    * with integer division — the SQL-replayable formula (the fixture
    * writes timescale = fps and one timescale-tick per sample, so
    * durationMs = nSamples * 1000 / fps, the same arithmetic as the
    * AVI fixture's scale=1/rate=fps). */
  final case class Mp4Meta(width: Int, height: Int, nSamples: Int,
      timescale: Int, durationMs: Long, codec: String)

  /** Audio-track metadata from the first `soun` trak (MP4 files carry
    * audio beside video; audio-only `.m4a` files carry nothing else):
    * channels/bits from the AudioSampleEntry, sampleRate = the mdhd
    * media timescale (authoritative for audio), nSamples = stsz count,
    * durationMs with the same integer formula as the video side. Null
    * for files without a walkable soun trak. */
  final case class Mp4AudioMeta(channels: Int, bits: Int, sampleRate: Int,
      nSamples: Int, durationMs: Long, codec: String)

  // ---- Box plumbing (big-endian, unlike RIFF's little-endian) --------

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val bodyLen = parts.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(8 + bodyLen)
    out.write(be32(8L + bodyLen)); out.write(tpe.getBytes("US-ASCII"))
    parts.foreach(out.write)
    out.toByteArray
  }

  /** FullBox = box with a leading version byte + 24-bit flags. */
  private def fullBox(tpe: String, version: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(tpe, (Array(((version & 0xff)).toByte) ++
      Array(((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte)) +: parts: _*)

  private val unityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Samples per chunk the fixture encoder writes: > 1 so stsc/stco
    * resolution walks real multi-sample chunks, small enough that the
    * short fixture clips still produce a ragged last chunk (two stsc
    * run entries) — the layout shape that catches a broken run walk. */
  private val fixtureSamplesPerChunk = 3

  /** Write an MP4 holding `samples` (each already-encoded PNG bytes)
    * at `fps` (timescale = fps, one tick per sample), with full
    * ftyp/moov sample tables and the payloads chunked
    * [[fixtureSamplesPerChunk]] per `stco` chunk — readable by any
    * ISO-BMFF-aware tool that knows the `mpng` sample-entry fourcc.
    * Layout: ftyp, moov, mdat — moov-first ("fast start"), so
    * metadata survives a truncated mdat, exactly the stage split the
    * quarantine gates verify. */
  def encodeMp4(samples: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] =
    encodeMp4Variant(samples, w, h, fps, useCo64 = false, version1 = false)

  /** Encoder variant knobs for the spec-legal shapes real corpora also
    * carry — 64-bit `co64` chunk offsets, version-1 (64-bit-time)
    * mvhd/tkhd/mdhd headers (both required for >4 GB / post-2040
    * files), and `mdatFirst` (the NON-faststart layout most capture
    * tools write: mdat before moov, so the metadata sits at the END
    * of the file) — so those walker branches are pinned by tests
    * against bytes this encoder itself lays out. Package-private: the
    * public fixture surface stays the common v0/stco/moov-first shape. */
  private[multimodal] def encodeMp4Variant(samples: Seq[Array[Byte]],
      w: Int, h: Int, fps: Int, useCo64: Boolean,
      version1: Boolean, mdatFirst: Boolean = false): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    require(samples.nonEmpty, "an MP4 fixture needs at least one sample")
    val n = samples.length
    val spc = fixtureSamplesPerChunk
    val nChunks = (n + spc - 1) / spc
    val chunkSizes = (0 until nChunks).map { c =>
      samples.slice(c * spc, math.min(n, (c + 1) * spc)).map(_.length.toLong).sum
    }

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))

    // moov is built twice: once with zero stco offsets to learn its
    // size (the sample-table shape — hence the size — depends only on
    // counts, never on the offsets), then with the real absolute
    // offsets computed from ftyp/moov/mdat-header lengths.
    def buildMoov(chunkOffsets: Seq[Long]): Array[Byte] = {
      val ver = if (version1) 1 else 0
      def beTime(v: Long): Array[Byte] = // creation/mod/duration width
        if (version1) be32(v >>> 32) ++ be32(v) else be32(v)
      val mvhd = fullBox("mvhd", ver, 0,
        beTime(0), beTime(0), // creation, modification
        be32(fps.toLong), beTime(n.toLong), // timescale, duration
        be32(0x00010000L), be16(0x0100), be16(0), // rate, volume, reserved
        be32(0), be32(0), // reserved
        unityMatrix,
        Array.fill(24)(0.toByte), // pre_defined
        be32(2)) // next_track_ID
      val tkhd = fullBox("tkhd", ver, 3, // enabled | in_movie
        beTime(0), beTime(0), be32(1), be32(0), // creation, mod, track_ID, reserved
        beTime(n.toLong), // duration (movie timescale = media timescale here)
        be32(0), be32(0), // reserved
        be16(0), be16(0), be16(0), be16(0), // layer, altgroup, volume, reserved
        unityMatrix,
        be32(w.toLong << 16), be32(h.toLong << 16)) // 16.16 fixed
      val mdhd = fullBox("mdhd", ver, 0,
        beTime(0), beTime(0), be32(fps.toLong), beTime(n.toLong),
        be16(0x55c4), be16(0)) // language "und", pre_defined
      val hdlr = fullBox("hdlr", 0, 0,
        be32(0), "vide".getBytes("US-ASCII"),
        be32(0), be32(0), be32(0), // reserved
        "GraftVideoHandler".getBytes("US-ASCII") :+ 0.toByte) // null-terminated name
      val stsd = {
        // VisualSampleEntry, fourcc "mpng": 8 header + 6 reserved +
        // 2 data_ref_idx + 16 pre_defined/reserved + 2 width +
        // 2 height + 4+4 dpi + 4 reserved + 2 frame_count +
        // 32 compressorname + 2 depth + 2 pre_defined = 86 bytes
        val entry = box("mpng",
          Array.fill(6)(0.toByte), be16(1), // reserved, data_reference_index
          Array.fill(16)(0.toByte), // pre_defined + reserved
          be16(w), be16(h),
          be32(0x00480000L), be32(0x00480000L), // 72 dpi
          be32(0), be16(1), // reserved, frame_count
          Array.fill(32)(0.toByte), // compressorname (empty pascal string)
          be16(24), be16(0xffff)) // depth, pre_defined
        fullBox("stsd", 0, 0, be32(1), entry)
      }
      val stts = fullBox("stts", 0, 0, be32(1), be32(n.toLong), be32(1))
      val stsc = {
        // run-coded samples-per-chunk: one entry when every chunk is
        // full, two when the last chunk is ragged
        val rem = n % spc
        val entries =
          if (nChunks == 1) Seq((1L, n.toLong))
          else if (rem == 0) Seq((1L, spc.toLong))
          else Seq((1L, spc.toLong), (nChunks.toLong, rem.toLong))
        fullBox("stsc", 0, 0,
          (be32(entries.length.toLong) +:
            entries.flatMap { case (fc, c) =>
              Seq(be32(fc), be32(c), be32(1)) }): _*)
      }
      val stsz = fullBox("stsz", 0, 0, be32(0), be32(n.toLong),
        samples.toArray.flatMap(s => be32(s.length.toLong)))
      val stco =
        if (useCo64) fullBox("co64", 0, 0, be32(nChunks.toLong),
          chunkOffsets.toArray.flatMap(o => be32(o >>> 32) ++ be32(o)))
        else fullBox("stco", 0, 0, be32(nChunks.toLong),
          chunkOffsets.toArray.flatMap(be32))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
      val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
      val minf = box("minf", vmhd, box("dinf", dref), stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }

    // moov-first: mdat payload starts after ftyp + moov + mdat header
    // (moov size learned from a zero-offset dry build). mdat-first:
    // the payload position is known without a dry build — the
    // non-faststart layout is also the layout whose absolute chunk
    // offsets don't depend on moov's size at all.
    val mdatPayloadStart =
      if (mdatFirst) ftyp.length.toLong + 8
      else ftyp.length.toLong + buildMoov(Seq.fill(nChunks)(0L)).length + 8
    val chunkOffsets = chunkSizes.scanLeft(mdatPayloadStart)(_ + _).init
    val moov = buildMoov(chunkOffsets)

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp)
    if (!mdatFirst) out.write(moov)
    out.write(be32(8L + chunkSizes.sum))
    out.write("mdat".getBytes("US-ASCII"))
    samples.foreach(out.write)
    if (mdatFirst) out.write(moov)
    out.toByteArray
  }

  /** Write a TWO-TRACK MP4: the [[encodeMp4]] video trak plus a
    * `soun` trak carrying raw PCM16 — sample entry `sowt`
    * (little-endian) or `twos` (big-endian), the QuickTime PCM
    * fourccs — one PCM frame per MP4 sample, all audio in one trailing
    * mdat chunk after the video chunks. The fixture behind the
    * audio-demux gate: [[extractAudioWav]] must recover exactly these
    * PCM bytes (byte-swapped for `twos`) wrapped as a WAV. `pcm` is
    * interleaved PCM16 in the BYTE ORDER the chosen fourcc declares. */
  def encodeMp4WithAudio(samples: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      pcm: Array[Byte], rate: Int, channels: Int,
      audioBigEndian: Boolean = false): Array[Byte] = {
    require(fps > 0 && rate > 0, "fps and rate must be positive")
    // samples MAY be empty: no vide trak is written at all — the
    // audio-only `.m4a` layout (podcast/music files), which the audio
    // view must read while the video view correctly yields null
    require(channels >= 1 && pcm.length % (channels * 2) == 0,
      "pcm must hold whole PCM16 frames")
    val n = samples.length
    val spc = fixtureSamplesPerChunk
    val nChunks = (n + spc - 1) / spc
    val chunkSizes = (0 until nChunks).map { c =>
      samples.slice(c * spc, math.min(n, (c + 1) * spc)).map(_.length.toLong).sum
    }
    val frameBytes = channels * 2
    val nAudio = pcm.length / frameBytes

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))

    def buildMoov(chunkOffsets: Seq[Long], audioChunkOffset: Long): Array[Byte] = {
      val mvhd = fullBox("mvhd", 0, 0,
        be32(0), be32(0), be32(fps.toLong), be32(n.toLong),
        be32(0x00010000L), be16(0x0100), be16(0),
        be32(0), be32(0), unityMatrix,
        Array.fill(24)(0.toByte), be32(3)) // next_track_ID: 3
      // ---- video trak (the encodeMp4 shape, track 1) ----
      def vTrak = {
        val tkhd = fullBox("tkhd", 0, 3,
          be32(0), be32(0), be32(1), be32(0), be32(n.toLong),
          be32(0), be32(0),
          be16(0), be16(0), be16(0), be16(0), unityMatrix,
          be32(w.toLong << 16), be32(h.toLong << 16))
        val mdhd = fullBox("mdhd", 0, 0,
          be32(0), be32(0), be32(fps.toLong), be32(n.toLong),
          be16(0x55c4), be16(0))
        val hdlr = fullBox("hdlr", 0, 0,
          be32(0), "vide".getBytes("US-ASCII"),
          be32(0), be32(0), be32(0),
          "GraftVideoHandler".getBytes("US-ASCII") :+ 0.toByte)
        val stsd = {
          val entry = box("mpng",
            Array.fill(6)(0.toByte), be16(1),
            Array.fill(16)(0.toByte),
            be16(w), be16(h),
            be32(0x00480000L), be32(0x00480000L),
            be32(0), be16(1),
            Array.fill(32)(0.toByte),
            be16(24), be16(0xffff))
          fullBox("stsd", 0, 0, be32(1), entry)
        }
        val stts = fullBox("stts", 0, 0, be32(1), be32(n.toLong), be32(1))
        val stsc = {
          val rem = n % spc
          val entries =
            if (nChunks == 1) Seq((1L, n.toLong))
            else if (rem == 0) Seq((1L, spc.toLong))
            else Seq((1L, spc.toLong), (nChunks.toLong, rem.toLong))
          fullBox("stsc", 0, 0,
            (be32(entries.length.toLong) +:
              entries.flatMap { case (fc, c) =>
                Seq(be32(fc), be32(c), be32(1)) }): _*)
        }
        val stsz = fullBox("stsz", 0, 0, be32(0), be32(n.toLong),
          samples.toArray.flatMap(s => be32(s.length.toLong)))
        val stco = fullBox("stco", 0, 0, be32(nChunks.toLong),
          chunkOffsets.toArray.flatMap(be32))
        val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
        val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
        val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
        val minf = box("minf", vmhd, box("dinf", dref), stbl)
        box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
      }
      // ---- audio trak (track 2, one chunk holding every PCM frame) ----
      val aTrak = {
        val tkhd = fullBox("tkhd", 0, 3,
          be32(0), be32(0), be32(2), be32(0),
          be32(nAudio.toLong * fps / math.max(1, rate)), // movie-timescale duration
          be32(0), be32(0),
          be16(0), be16(0), be16(0x0100), be16(0), unityMatrix,
          be32(0), be32(0)) // audio has no visual dims
        val mdhd = fullBox("mdhd", 0, 0,
          be32(0), be32(0), be32(rate.toLong), be32(nAudio.toLong),
          be16(0x55c4), be16(0))
        val hdlr = fullBox("hdlr", 0, 0,
          be32(0), "soun".getBytes("US-ASCII"),
          be32(0), be32(0), be32(0),
          "GraftAudioHandler".getBytes("US-ASCII") :+ 0.toByte)
        val stsd = {
          // AudioSampleEntry: 6 reserved + 2 data_ref + version(2)
          // revision(2) vendor(4) + channels(2) samplesize(2) +
          // pre_defined(2) reserved(2) + samplerate (16.16)
          val fourccA = if (audioBigEndian) "twos" else "sowt"
          val entry = box(fourccA,
            Array.fill(6)(0.toByte), be16(1),
            be16(0), be16(0), be32(0),
            be16(channels), be16(16),
            be16(0), be16(0),
            be32(rate.toLong << 16))
          fullBox("stsd", 0, 0, be32(1), entry)
        }
        val stts = fullBox("stts", 0, 0, be32(1), be32(nAudio.toLong), be32(1))
        val stsc = fullBox("stsc", 0, 0, be32(1),
          be32(1), be32(nAudio.toLong), be32(1))
        val stsz = fullBox("stsz", 0, 0,
          be32(frameBytes.toLong), be32(nAudio.toLong)) // uniform sizes
        val stco = fullBox("stco", 0, 0, be32(1), be32(audioChunkOffset))
        val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
        val smhd = fullBox("smhd", 0, 0, be16(0), be16(0))
        val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
        val minf = box("minf", smhd, box("dinf", dref), stbl)
        box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
      }
      if (n == 0) box("moov", mvhd, aTrak) // audio-only: no vide trak
      else box("moov", mvhd, vTrak, aTrak)
    }

    // two-pass: moov size depends on counts only, never the offsets
    val moovLen = buildMoov(Seq.fill(nChunks)(0L), 0L).length
    val mdatPayloadStart = ftyp.length.toLong + moovLen + 8
    val chunkOffsets = chunkSizes.scanLeft(mdatPayloadStart)(_ + _).init
    val audioChunkOffset = mdatPayloadStart + chunkSizes.sum
    val moov = buildMoov(chunkOffsets, audioChunkOffset)

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    out.write(be32(8L + chunkSizes.sum + pcm.length))
    out.write("mdat".getBytes("US-ASCII"))
    samples.foreach(out.write)
    out.write(pcm)
    out.toByteArray
  }

  /** Solid two-track fixture: [[encodeSolidMp4]]'s video plus a
    * constant-fill PCM16 audio track (channel 0 = `v0`, channel 1 =
    * `v1` when stereo) — every audio statistic exactly computable from
    * the parameters, mirroring the WAV/AIFF fixtures. */
  def encodeSolidMp4WithAudio(nFrames: Int, w: Int, h: Int, fps: Int,
      va: Int, audioFrames: Int, rate: Int, channels: Int,
      v0: Int, v1: Int, audioBigEndian: Boolean = false): Array[Byte] = {
    val png = Multimodal.ImageCodec.encodePng(w, h, va, va, va)
    val pcm = new Array[Byte](audioFrames * channels * 2)
    var f = 0
    while (f < audioFrames) {
      var c = 0
      while (c < channels) {
        val v = if (c == 0) v0 else v1
        val at = (f * channels + c) * 2
        if (audioBigEndian) {
          pcm(at) = ((v >> 8) & 0xff).toByte; pcm(at + 1) = (v & 0xff).toByte
        } else {
          pcm(at) = (v & 0xff).toByte; pcm(at + 1) = ((v >> 8) & 0xff).toByte
        }
        c += 1
      }
      f += 1
    }
    encodeMp4WithAudio(Seq.fill(nFrames)(png), w, h, fps, pcm, rate,
      channels, audioBigEndian)
  }

  /** Write a FRAGMENTED MP4 (fMP4 — the DASH/HLS streaming layout):
    * `moov` carries the track headers, an EMPTY `stbl` (zero-entry
    * stts/stsc/stsz/stco — spec-shaped for a fragmented movie) and
    * `mvex/trex` defaults (1 timescale-tick per sample, so duration
    * falls out of the fragment walk); the samples arrive as
    * `samplesPerFragment`-sized `moof`+`mdat` pairs whose `trun`
    * data offsets anchor on default-base-is-moof. Exercises the
    * fragment walk against bytes this encoder itself lays out —
    * the metadata (geometry, sample count, duration) is identical to
    * [[encodeMp4]]'s for the same inputs, which is what lets the q254
    * oracle cover both layouts with one prediction. */
  def encodeFragmentedMp4(samples: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int, samplesPerFragment: Int = 2): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    require(samples.nonEmpty, "an fMP4 fixture needs at least one sample")
    require(samplesPerFragment >= 1, "samplesPerFragment must be >= 1")
    val n = samples.length

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "iso5".getBytes("US-ASCII"))

    val moov = {
      val mvhd = fullBox("mvhd", 0, 0,
        be32(0), be32(0), be32(fps.toLong), be32(0), // duration 0: fragmented
        be32(0x00010000L), be16(0x0100), be16(0),
        be32(0), be32(0), unityMatrix,
        Array.fill(24)(0.toByte), be32(2))
      val tkhd = fullBox("tkhd", 0, 3,
        be32(0), be32(0), be32(1), be32(0), be32(0),
        be32(0), be32(0),
        be16(0), be16(0), be16(0), be16(0), unityMatrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
      val mdhd = fullBox("mdhd", 0, 0,
        be32(0), be32(0), be32(fps.toLong), be32(0), be16(0x55c4), be16(0))
      val hdlr = fullBox("hdlr", 0, 0,
        be32(0), "vide".getBytes("US-ASCII"),
        be32(0), be32(0), be32(0),
        "GraftVideoHandler".getBytes("US-ASCII") :+ 0.toByte) // null-terminated name
      val stsd = {
        val entry = box("mpng",
          Array.fill(6)(0.toByte), be16(1),
          Array.fill(16)(0.toByte),
          be16(w), be16(h),
          be32(0x00480000L), be32(0x00480000L),
          be32(0), be16(1),
          Array.fill(32)(0.toByte),
          be16(24), be16(0xffff))
        fullBox("stsd", 0, 0, be32(1), entry)
      }
      val stbl = box("stbl", stsd,
        fullBox("stts", 0, 0, be32(0)),
        fullBox("stsc", 0, 0, be32(0)),
        fullBox("stsz", 0, 0, be32(0), be32(0)),
        fullBox("stco", 0, 0, be32(0)))
      val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
      val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
      val minf = box("minf", vmhd, box("dinf", dref), stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      // trex: track 1, sample_description_index 1, default duration
      // 1 tick (timescale = fps → one frame per tick), default size 0
      // (every trun carries explicit sizes), default flags 0
      val trex = fullBox("trex", 0, 0,
        be32(1), be32(1), be32(1), be32(0), be32(0))
      box("moov", mvhd, trak, box("mvex", trex))
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var seq = 1
    var idx = 0
    while (idx < n) {
      val frag = samples.slice(idx, math.min(n, idx + samplesPerFragment))
      def buildMoof(dataOffset: Long): Array[Byte] = {
        val mfhd = fullBox("mfhd", 0, 0, be32(seq.toLong))
        val tfhd = fullBox("tfhd", 0, 0x020000, be32(1)) // default-base-is-moof
        val tfdt = fullBox("tfdt", 0, 0, be32(idx.toLong))
        val trun = fullBox("trun", 0, 0x201, // data-offset + sample-size
          be32(frag.length.toLong), be32(dataOffset),
          frag.toArray.flatMap(s => be32(s.length.toLong)))
        box("moof", mfhd, box("traf", tfhd, tfdt, trun))
      }
      // two-pass: the trun's data_offset (moof start → mdat payload)
      // depends only on the moof's own length, which the offset's
      // fixed 4 bytes cannot change
      val moofLen = buildMoof(0).length
      out.write(buildMoof(moofLen + 8L))
      out.write(be32(8L + frag.map(_.length).sum))
      out.write("mdat".getBytes("US-ASCII"))
      frag.foreach(out.write)
      seq += 1; idx += frag.length
    }
    out.toByteArray
  }

  /** Fragmented twin of [[encodeSolidMp4]] — same SQL-predictable
    * statistics from the same parameters, different container layout. */
  def encodeSolidFragmentedMp4(nFrames: Int, w: Int, h: Int, fps: Int,
      cutIdx: Int, vA: Int, vB: Int): Array[Byte] = {
    val pngA = Multimodal.ImageCodec.encodePng(w, h, vA, vA, vA)
    lazy val pngB = Multimodal.ImageCodec.encodePng(w, h, vB, vB, vB)
    encodeFragmentedMp4((0 until nFrames).map { i =>
      if (cutIdx >= 0 && i >= cutIdx) pngB else pngA
    }, w, h, fps)
  }

  // ---- Walker ---------------------------------------------------------

  /** Per-track parse state, committed only for the FIRST `vide`
    * handler track — a later audio/subtitle track (or second video)
    * must not overwrite the pinned track's tables, mirroring the AVI
    * walker's first-vids-stream pinning. */
  private final class TrakState {
    var handler: String = null
    var trackId = -1L
    var timescale = -1L
    var duration = -1L
    var width = -1; var height = -1
    var channels = -1; var bits = -1 // AudioSampleEntry fields (soun traks)
    var codec: String = null
    var sttsTotal = -1L
    var sizes: Array[Long] = null
    var stscFirstChunk: Array[Long] = null
    var stscSamplesPerChunk: Array[Long] = null
    var chunkOffsets: Array[Long] = null
    // fragmented-MP4 state (moof/traf/trun): per-sample byte ranges
    // resolved at fragment-walk time, plus the fragments' total
    // duration in media-timescale ticks (an fMP4's mdhd duration is
    // legitimately 0 — the movie grows by appending fragments)
    val fragRanges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var fragDurationTicks = 0L
  }

  /** Caps on header-DECLARED counts, enforced before any allocation:
    * a crafted stsz/stco count field costs 4 bytes to declare but
    * `count * 8` heap bytes to believe — an OutOfMemoryError is an
    * Error that escapes the Exception quarantine and can take the
    * executor down. Non-uniform counts are additionally bounded by
    * the bytes actually present in the declaring box; the cap is the
    * only guard for the uniform-stsz shape, whose count costs nothing
    * to declare but `count × 8` bytes to expand (4M caps that at
    * 32 MB transient, well inside the image codec's 256 MB raster
    * budget). */
  private val maxDeclaredSamples = 1 << 22 // 4M samples ≈ a day of 50fps

  private def malformed(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Boxes the walker descends into or reads fields from: a truncated
    * instance of one of THESE is malformed (the metadata cannot be
    * trusted); a truncated box the walker merely skips — above all a
    * tail-cut `mdat` — ends that level's walk gracefully instead, so
    * moov-first files keep their metadata when the payload is cut
    * (exactly how real players treat progressive downloads; the
    * sample-range resolution still quarantines the PAYLOAD, which is
    * the stage split the quarantine gates report). */
  private val parsedBoxes = Set("moov", "trak", "mdia", "minf", "stbl",
    "mvhd", "tkhd", "mdhd", "hdlr", "stsd", "stts", "stsz", "stsc",
    "stco", "co64")

  /** Walk the box tree: metadata from tkhd/mdhd/stsd plus the raw
    * sample tables of the first `vide` track. None for anything that
    * is not a spec-shaped MP4 (wrong/missing ftyp, truncated metadata
    * boxes, inconsistent sample tables). Sample BYTE ranges are
    * resolved separately by [[resolveRanges]] so a readable header
    * over a truncated payload keeps its metadata. */
  /** First vide + first soun tracks of the box tree (either may be
    * null — a video-only file has no soun, an audio-only `.m4a` no
    * vide). Produced by ONE shared walk ([[walkTracks]]); the video
    * view validates in [[parseMeta]], the audio view in
    * [[parseAudio]]. */
  private final class Tracks(val vide: TrakState, val soun: TrakState)

  /** The ftyp gate both views share — the MP4 analogue of the
    * RIFF/AVI magic check (every spec-conformant file leads with
    * ftyp). */
  private def isMp4(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 16 &&
      u32(blob, 0) >= 16 && fourcc(blob, 4) == "ftyp"

  /** Walk the whole box tree once, collecting the first vide and
    * first soun tracks' states. THROWS on malformed shapes (truncated
    * parsed boxes, inconsistent tables, over-deep nesting) — the
    * public views wrap it in their Exception quarantine. */
  private def walkTracks(blob: Array[Byte]): Tracks = {
      // depth cap: spec-shaped files nest ≤ ~6 container levels
      // (moov → trak → mdia → minf → stbl), but a corrupt/adversarial
      // blob of back-to-back 8-byte container headers would
      // StackOverflowError — an Error, which ESCAPES the Exception
      // quarantine in the callers. Past the cap the blob is declared
      // malformed.
      val maxDepth = 16
      var committed: TrakState = null
      var soundTrak: TrakState = null
      // mvex/trex per-track defaults (fragmented files): track_ID →
      // (default_sample_duration, default_sample_size). Populated
      // while walking moov, consumed at moof time — spec order
      // guarantees moov precedes every moof.
      val trexDefaults = scala.collection.mutable.Map[Long, (Long, Long)]()

      // ---- fragment walk (fMP4: moof → traf → tfhd/trun) ------------
      // Resolves each trun's per-sample byte ranges against the
      // default-base-is-moof / base-data-offset anchor and appends
      // them to the committed video track. Prefix-valid by design:
      // fragments are the append unit of the format, so a file cut
      // AFTER a complete fragment still yields that prefix's samples
      // (ranges pointing past the cut still quarantine in
      // resolveRanges).
      //
      // `prevTrafEnd` threads the spec's third base-offset anchor
      // through the moof's trafs: when tfhd carries NEITHER
      // base-data-offset NOR default-base-is-moof, the base defaults
      // to the end of the PREVIOUS traf's data (moof start for the
      // first traf) — ISO/IEC 14496-12 §8.8.7. Returns this traf's
      // data end for the next traf's default: -1 = no data yet (base
      // stays moof start), -2 = unknown (a foreign-track traf whose
      // truns we skip — a later flags-less traf can't anchor on it and
      // quarantines rather than silently resolving wrong ranges).
      def parseTraf(moofPos: Long, from: Int, to: Int,
          prevTrafEnd: Long): Long = {
        val t = committed
        if (t == null) return prevTrafEnd
        var trafTrack = -1L
        var baseOffset = moofPos // default-base-is-moof and the first-traf default
        var defSize = -1L
        var defDur = -1L
        var running = -1L // next trun's start when it omits data_offset
        var pos = from
        while (pos + 8 <= to) {
          val size = u32(blob, pos)
          if (size < 8 || pos + size > to) malformed("truncated traf child")
          val tpe = fourcc(blob, pos + 4)
          val body = pos + 8
          val bodyEnd = (pos + size).toInt
          tpe match {
            case "tfhd" =>
              if (body + 8 > bodyEnd) malformed("truncated tfhd")
              val flags = (u32(blob, body) & 0xffffffL).toInt
              trafTrack = u32(blob, body + 4)
              var off = body + 8
              if ((flags & 0x1) != 0) { // base-data-offset present
                if (off + 8 > bodyEnd) malformed("truncated tfhd base offset")
                baseOffset = u64(blob, off); off += 8
              } else if ((flags & 0x020000) == 0) {
                // neither explicit base nor default-base-is-moof: the
                // spec default is the previous traf's data end (moof
                // start when this is the moof's first traf). A foreign
                // traf in between (prevTrafEnd == -2) left that end
                // unknown — quarantine instead of guessing.
                if (prevTrafEnd >= 0) baseOffset = prevTrafEnd
                else if (prevTrafEnd == -2L)
                  malformed("flags-less traf after unparsed traf")
                // prevTrafEnd == -1: first traf, moofPos default stands
              }
              if ((flags & 0x2) != 0) off += 4 // sample_description_index
              if ((flags & 0x8) != 0) { // default_sample_duration
                if (off + 4 > bodyEnd) malformed("truncated tfhd duration")
                defDur = u32(blob, off); off += 4
              }
              if ((flags & 0x10) != 0) { // default_sample_size
                if (off + 4 > bodyEnd) malformed("truncated tfhd size")
                defSize = u32(blob, off); off += 4
              }
              val trex = trexDefaults.get(trafTrack)
              if (defDur < 0) defDur = trex.map(_._1).getOrElse(-1L)
              if (defSize < 0) defSize = trex.map(_._2).getOrElse(-1L)
            case "trun" if trafTrack == t.trackId =>
              if (body + 8 > bodyEnd) malformed("truncated trun")
              val flags = (u32(blob, body) & 0xffffffL).toInt
              val count = u32(blob, body + 4)
              if (count + t.fragRanges.length + t.sizes.length >
                maxDeclaredSamples) malformed("trun count past cap")
              var off = body + 8
              var start =
                if ((flags & 0x1) != 0) { // data_offset present (signed)
                  if (off + 4 > bodyEnd) malformed("truncated trun offset")
                  val d = u32(blob, off).toInt; off += 4 // sign via toInt
                  baseOffset + d
                } else if (running >= 0) running
                else baseOffset
              if ((flags & 0x4) != 0) off += 4 // first_sample_flags
              // per-sample field widths from the flag nibble
              val hasDur = (flags & 0x100) != 0
              val hasSize = (flags & 0x200) != 0
              val perSample = (if (hasDur) 4 else 0) + (if (hasSize) 4 else 0) +
                (if ((flags & 0x400) != 0) 4 else 0) +
                (if ((flags & 0x800) != 0) 4 else 0)
              if (off + count * perSample > bodyEnd)
                malformed("trun entries past box")
              if (!hasSize && defSize <= 0) malformed("trun without any sample size")
              var i = 0L
              while (i < count) {
                var dur = defDur
                var sz = defSize
                var f = off + (i * perSample).toInt
                if (hasDur) { dur = u32(blob, f); f += 4 }
                if (hasSize) { sz = u32(blob, f); f += 4 }
                t.fragRanges += ((start, sz))
                start += sz
                if (dur > 0) t.fragDurationTicks += dur
                i += 1
              }
              running = start
            case _ => () // tfdt, sbgp, sdtp, … — not needed for ranges
          }
          pos = (pos + size).toInt
        }
        // this traf's data end, for the next flags-less traf's base:
        // ours with truns → running end; foreign (truns skipped, end
        // unknowable) → -2; ours without truns → previous end stands
        if (trafTrack >= 0 && trafTrack != t.trackId) -2L
        else if (running >= 0) running
        else prevTrafEnd
      }

      def parseMoof(moofPos: Int, from: Int, to: Int): Unit = {
        var pos = from
        var prevTrafEnd = -1L // first traf anchors on the moof start
        while (pos + 8 <= to) {
          val size = u32(blob, pos)
          if (size < 8 || pos + size > to) malformed("truncated moof child")
          if (fourcc(blob, pos + 4) == "traf")
            prevTrafEnd =
              parseTraf(moofPos.toLong, pos + 8, (pos + size).toInt, prevTrafEnd)
          pos = (pos + size).toInt
        }
      }

      def walk(from: Int, to: Int, depth: Int, trak: TrakState): Unit = {
        if (depth > maxDepth) malformed("box nesting too deep")
        var pos = from
        while (pos + 8 <= to) {
          val declared = u32(blob, pos)
          val tpe = fourcc(blob, pos + 4)
          // size==1 → 64-bit largesize follows; size==0 → to end of
          // enclosing box (both spec-legal; real >4 GB corpora use them)
          var bodyStart = pos + 8
          val end: Long =
            if (declared == 1L) {
              if (pos + 16 > to) malformed("truncated largesize header")
              bodyStart = pos + 16
              val ls = u64(blob, pos + 8)
              if (ls < 16) malformed("largesize below header size")
              pos + ls
            } else if (declared == 0L) to.toLong
            else if (declared < 8) malformed("box size below header size")
            else pos + declared
          if (end > to) {
            if (parsedBoxes(tpe)) malformed("truncated " + tpe)
            return // tail-cut skipped box (e.g. mdat): metadata stands
          }
          val bodyEnd = end.toInt

          tpe match {
            case "moov" | "mdia" | "minf" | "stbl" | "mvex" =>
              walk(bodyStart, bodyEnd, depth + 1, trak)
            case "trak" =>
              val st = new TrakState
              walk(bodyStart, bodyEnd, depth + 1, st)
              if (st.handler == "vide" && committed == null) committed = st
              else if (st.handler == "soun" && soundTrak == null) soundTrak = st
            case "trex" =>
              // per-track fragment defaults: vf(4) track_ID(4)
              // sample_description_index(4) duration(4) size(4) flags(4)
              if (bodyStart + 20 > bodyEnd) malformed("truncated trex")
              trexDefaults(u32(blob, bodyStart + 4)) =
                (u32(blob, bodyStart + 12), u32(blob, bodyStart + 16))
            case "moof" =>
              parseMoof(pos, bodyStart, bodyEnd)
            case "mdhd" if trak != null =>
              if (bodyStart + 4 > bodyEnd) malformed("truncated mdhd")
              val v = blob(bodyStart) & 0xff
              // v0: creation(4) mod(4) timescale(4) duration(4)
              // v1: creation(8) mod(8) timescale(4) duration(8)
              if (v == 1) {
                if (bodyStart + 32 > bodyEnd) malformed("truncated mdhd v1")
                trak.timescale = u32(blob, bodyStart + 20)
                trak.duration = u64(blob, bodyStart + 24)
              } else {
                if (bodyStart + 24 > bodyEnd) malformed("truncated mdhd v0")
                trak.timescale = u32(blob, bodyStart + 12)
                trak.duration = u32(blob, bodyStart + 16)
              }
            case "hdlr" if trak != null =>
              if (bodyStart + 12 > bodyEnd) malformed("truncated hdlr")
              trak.handler = fourcc(blob, bodyStart + 8)
            case "tkhd" if trak != null =>
              // geometry fallback (stsd's integer dims win when present):
              // vf(4) creation mod track_ID reserved duration (4 bytes
              // each at v0, times 8 bytes at v1) reserved(8) layer(2)
              // alt(2) vol(2) res(2) matrix(36) → width at body+76 (v0)
              // / +88 (v1), both 16.16 fixed
              val v = blob(bodyStart) & 0xff
              val idOff = bodyStart + (if (v == 1) 20 else 12)
              if (idOff + 4 <= bodyEnd) trak.trackId = u32(blob, idOff)
              val wOff = bodyStart + (if (v == 1) 88 else 76)
              if (wOff + 8 <= bodyEnd) {
                trak.width = (u32(blob, wOff) >> 16).toInt
                trak.height = (u32(blob, wOff + 4) >> 16).toInt
              }
            case "stsd" if trak != null =>
              if (bodyStart + 8 > bodyEnd) malformed("truncated stsd")
              if (u32(blob, bodyStart + 4) >= 1) {
                val entry = bodyStart + 8
                if (entry + 8 > bodyEnd) malformed("truncated sample entry")
                trak.codec = fourcc(blob, entry + 4).trim.toLowerCase
                if (trak.handler == "soun") {
                  // AudioSampleEntry v0: 8 header + 6 reserved +
                  // 2 data_ref + version(2) revision(2) vendor(4) →
                  // channels at +24, samplesize at +26 (hdlr precedes
                  // minf/stbl in a spec-shaped mdia, so the handler is
                  // known by the time stsd parses)
                  if (entry + 28 <= bodyEnd) {
                    trak.channels = u16(blob, entry + 24)
                    trak.bits = u16(blob, entry + 26)
                  }
                } else if (entry + 36 <= bodyEnd) {
                  // VisualSampleEntry dims (see encodeMp4's layout note)
                  trak.width = u16(blob, entry + 32)
                  trak.height = u16(blob, entry + 34)
                }
              }
            case "stts" if trak != null =>
              if (bodyStart + 8 > bodyEnd) malformed("truncated stts")
              val nEnt = u32(blob, bodyStart + 4)
              if (bodyStart + 8 + nEnt * 8 > bodyEnd) malformed("stts entries past box")
              var total = 0L; var i = 0L
              while (i < nEnt) {
                total += u32(blob, (bodyStart + 8 + i * 8).toInt)
                i += 1
              }
              trak.sttsTotal = total
            case "stsz" if trak != null =>
              if (bodyStart + 12 > bodyEnd) malformed("truncated stsz")
              val uniform = u32(blob, bodyStart + 4)
              val count = u32(blob, bodyStart + 8)
              if (count > maxDeclaredSamples) malformed("stsz count past cap")
              if (uniform == 0L) {
                // per-sample sizes: the declared count must fit the
                // bytes actually present BEFORE the array allocation
                if (bodyStart + 12 + count * 4 > bodyEnd)
                  malformed("stsz sizes past box")
                val sizes = new Array[Long](count.toInt)
                var i = 0
                while (i < sizes.length) {
                  sizes(i) = u32(blob, bodyStart + 12 + i * 4); i += 1
                }
                trak.sizes = sizes
              } else trak.sizes = Array.fill(count.toInt)(uniform)
            case "stsc" if trak != null =>
              if (bodyStart + 8 > bodyEnd) malformed("truncated stsc")
              val nEnt = u32(blob, bodyStart + 4)
              if (bodyStart + 8 + nEnt * 12 > bodyEnd) malformed("stsc entries past box")
              val fc = new Array[Long](nEnt.toInt)
              val sp = new Array[Long](nEnt.toInt)
              var i = 0
              while (i < fc.length) {
                fc(i) = u32(blob, bodyStart + 8 + i * 12)
                sp(i) = u32(blob, bodyStart + 12 + i * 12)
                // first_chunk runs must start at 1 and strictly increase
                if (fc(i) < 1 || (i > 0 && fc(i) <= fc(i - 1)) || sp(i) < 1)
                  malformed("stsc run not increasing")
                i += 1
              }
              if (fc.nonEmpty && fc(0) != 1L) malformed("stsc must start at chunk 1")
              trak.stscFirstChunk = fc
              trak.stscSamplesPerChunk = sp
            case "stco" | "co64" if trak != null =>
              if (bodyStart + 8 > bodyEnd) malformed("truncated " + tpe)
              val nEnt = u32(blob, bodyStart + 4)
              val entW = if (tpe == "stco") 4 else 8
              if (bodyStart + 8 + nEnt * entW > bodyEnd)
                malformed(tpe + " offsets past box")
              val offs = new Array[Long](nEnt.toInt)
              var i = 0
              while (i < offs.length) {
                offs(i) = if (entW == 4) u32(blob, bodyStart + 8 + i * 4)
                  else u64(blob, bodyStart + 8 + i * 8)
                i += 1
              }
              trak.chunkOffsets = offs
            case _ => () // ftyp, mdat, free, udta, edts, … — skipped
          }
          if (end.toInt <= pos) malformed("non-advancing box")
          pos = end.toInt
        }
      }

      walk(0, blob.length, 0, null)
      new Tracks(committed, soundTrak)
  }

  private def parseMeta(blob: Array[Byte]): Option[(Mp4Meta, TrakState)] = {
    if (!isMp4(blob)) return None
    try {
      val t = walkTracks(blob).vide
      if (t == null || t.sizes == null || t.stscFirstChunk == null ||
        t.chunkOffsets == null || t.timescale <= 0 || t.width < 0) return None
      // stts is the sample count's second witness: when present it
      // must agree with stsz (a spec-shaped file keeps them in sync;
      // disagreement means a corrupt table and the samples can't be
      // trusted)
      if (t.sttsTotal >= 0 && t.sttsTotal != t.sizes.length) return None
      // a zero-entry stsc cannot place a nonzero stsz count in any
      // chunk — inconsistent tables, same corrupt-metadata class as
      // the stts/stsz disagreement above (and believing it would walk
      // stscSamplesPerChunk(0) off the empty array at resolve time)
      if (t.sizes.length > 0 && t.stscFirstChunk.isEmpty) return None
      val n = t.sizes.length + t.fragRanges.length
      // an fMP4's mdhd duration is legitimately 0 (the movie grows by
      // appending fragments) — fall back to the fragments' summed
      // sample durations in the same timescale. When a purely-
      // fragmented movie states BOTH (some muxers write the fragment
      // sum into mdhd), the two count the same timescale ticks and
      // must agree exactly — the duration's second witness, mirroring
      // the stts/stsz rule above; disagreement is a corrupt table.
      if (t.sizes.isEmpty && t.fragRanges.nonEmpty && t.duration > 0 &&
        t.fragDurationTicks > 0 && t.duration != t.fragDurationTicks)
        return None
      val effDuration =
        if (t.duration > 0) t.duration
        else if (t.fragDurationTicks > 0) t.fragDurationTicks
        else t.duration
      // multiplyExact: mdhd duration is an unvalidated u64 — an
      // adversarial value must quarantine (ArithmeticException → the
      // Exception catch below), not wrap into a garbage durationMs
      val meta = Mp4Meta(t.width, t.height, n, t.timescale.toInt,
        if (effDuration >= 0) Math.multiplyExact(effDuration, 1000L) / t.timescale
        else -1L,
        if (t.codec != null) t.codec else "unknown")
      Some((meta, t))
    } catch { case _: Exception => None }
  }

  /** Resolve sample → byte range through the stsc run walk: run i
    * covers chunks [firstChunk(i), firstChunk(i+1)), each holding
    * samplesPerChunk(i) consecutive samples laid back-to-back at the
    * chunk's stco/co64 offset. RANGES ONLY — no sample bytes are
    * copied here: consumers stream per sample ([[frameMeans]] decodes
    * sample i straight out of the blob and drops it before touching
    * sample i+1, so peak live bytes per row are blob + one raster, not
    * blob + every sample copy), or slice only what they keep
    * ([[decimate]]). None when any resolved range falls outside the
    * blob (truncated mdat, offset table past EOF — checked
    * overflow-safely: a co64/tfhd offset near Long.MaxValue must fail
    * the bounds test, not wrap past it) or the chunk table can't cover
    * the declared sample count — SAMPLE-depth quarantine, reached only
    * after the metadata already parsed. The whole walk is additionally
    * Exception-quarantined: table shapes parseMeta's validation can't
    * anticipate must yield None, never a task-killing throw. */
  private def resolveRanges(blob: Array[Byte],
      t: TrakState): Option[(Array[Long], Array[Int])] = try {
    val n = t.sizes.length
    // off ≤ blob.length && size ≤ blob.length - off: equivalent to
    // off + size ≤ blob.length but immune to Long overflow
    def inBlob(off: Long, size: Long): Boolean =
      off >= 0 && size >= 0 && off <= blob.length &&
        size <= blob.length - off
    val offs = new Array[Long](n + t.fragRanges.length)
    val lens = new Array[Int](n + t.fragRanges.length)
    var si = 0
    var run = 0
    var chunk = 0 // 0-based
    while (si < n && chunk < t.chunkOffsets.length) {
      while (run + 1 < t.stscFirstChunk.length &&
        chunk + 1 >= t.stscFirstChunk(run + 1)) run += 1
      val spc = t.stscSamplesPerChunk(run)
      var off = t.chunkOffsets(chunk)
      var k = 0L
      while (k < spc && si < n) {
        val size = t.sizes(si)
        if (!inBlob(off, size)) return None
        offs(si) = off; lens(si) = size.toInt
        off += size; si += 1; k += 1
      }
      chunk += 1
    }
    if (si != n) return None // chunk table too short for the stbl samples
    // fragment samples (moof/trun), in fragment order, after the
    // moov-described ones — same in-blob bounds contract
    var fi = 0
    while (fi < t.fragRanges.length) {
      val (off, size) = t.fragRanges(fi)
      if (!inBlob(off, size)) return None
      offs(n + fi) = off; lens(n + fi) = size.toInt
      fi += 1
    }
    Some((offs, lens))
  } catch { case _: Exception => None }

  private def parseRanges(blob: Array[Byte]): Option[(Mp4Meta, Array[Long], Array[Int])] =
    parseMeta(blob).flatMap { case (m, t) =>
      resolveRanges(blob, t).map { case (offs, lens) => (m, offs, lens) } }

  /** The audio view over the same walk: validate the first `soun`
    * trak's tables with the video side's rules (stts second witness,
    * zero-entry-stsc reject, multiplyExact duration). Fragmented audio
    * is out of scope — the fragment walk ties to the video track, so
    * an fMP4's audio samples don't resolve and the audio view
    * quarantines (documented partial; plain and non-faststart layouts
    * cover the overwhelmingly common demux case). */
  private def parseAudio(blob: Array[Byte]): Option[(Mp4AudioMeta, TrakState)] = {
    if (!isMp4(blob)) return None
    try {
      val t = walkTracks(blob).soun
      if (t == null || t.sizes == null || t.stscFirstChunk == null ||
        t.chunkOffsets == null || t.timescale <= 0 || t.channels < 1 ||
        t.bits < 1) return None
      if (t.sttsTotal >= 0 && t.sttsTotal != t.sizes.length) return None
      if (t.sizes.length > 0 && t.stscFirstChunk.isEmpty) return None
      val meta = Mp4AudioMeta(t.channels, t.bits, t.timescale.toInt,
        t.sizes.length,
        if (t.duration >= 0) Math.multiplyExact(t.duration, 1000L) / t.timescale
        else -1L,
        if (t.codec != null) t.codec else "unknown")
      Some((meta, t))
    } catch { case _: Exception => None }
  }

  /** Audio-track metadata alone — no payload bytes touched. */
  def decodeAudioMeta(blob: Array[Byte]): Mp4AudioMeta =
    parseAudio(blob).map(_._1).orNull

  /** DEMUX the first `soun` track's PCM16 payload and re-wrap it as a
    * WAV — the audio-from-video step an ASR/audio-quality pipeline
    * runs over a video corpus, and the whole read path for audio-only
    * `.m4a`-style files. Supports the two QuickTime PCM16 sample-entry
    * fourccs: `sowt` (little-endian, WAV's order — bytes pass through
    * untouched) and `twos` (big-endian — byte-swapped per 16-bit
    * sample during the copy). Anything else (AAC etc.) quarantines as
    * null: this engine extracts stored PCM, it does not decode
    * perceptual codecs. The output decodes with [[Multimodal.AudioCodec]]
    * like any other WAV, so every downstream audio stage (means, peak,
    * windows, energy hash) composes. Sample payload bytes are copied
    * exactly once, in chunk-walk order. */
  def extractAudioWav(blob: Array[Byte]): Array[Byte] =
    parseAudio(blob).flatMap { case (m, t) =>
      val le = m.codec == "sowt"
      if ((!le && m.codec != "twos") || m.bits != 16) None
      else resolveRanges(blob, t).flatMap { case (offs, lens) =>
        var total = 0L
        var i = 0
        while (i < lens.length) { total += lens(i); i += 1 }
        // each range is in-blob, but a corrupt stco can OVERLAP ranges:
        // the sum is not bounded by the blob, and believing it would
        // wrap the allocation. Cap at the image codec's decode budget.
        if (total > (1L << 28)) None
        else {
          val pcm = new Array[Byte](total.toInt)
          var at = 0
          i = 0
          while (i < offs.length) {
            System.arraycopy(blob, offs(i).toInt, pcm, at, lens(i))
            at += lens(i); i += 1
          }
          if (!le) { // twos: swap each 16-bit sample to WAV's little-endian
            var j = 0
            while (j + 1 < pcm.length) {
              val b = pcm(j); pcm(j) = pcm(j + 1); pcm(j + 1) = b; j += 2
            }
          }
          Some(Multimodal.AudioCodec.writeWav(pcm, m.sampleRate.toFloat, m.channels))
        }
      }
    }.orNull

  private def slice(blob: Array[Byte], off: Long, len: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(blob, off.toInt, off.toInt + len)

  /** Container metadata from the moov walk alone — survives a
    * truncated/absent payload (stage split: header vs sample depth). */
  def decodeMeta(blob: Array[Byte]): Mp4Meta =
    parseMeta(blob).map(_._1).orNull

  /** Stored sample payloads (PNG bytes for the fixture clips),
    * container-level only — no pixel decode. Null for non-MP4 bytes
    * or sample ranges outside the blob. The one API that materializes
    * every sample at once — by definition of its return type; the
    * pixel paths below stream instead. */
  def samples(blob: Array[Byte]): Array[Array[Byte]] =
    parseRanges(blob).map { case (_, offs, lens) =>
      Array.tabulate(offs.length)(i => slice(blob, offs(i), lens(i)))
    }.orNull

  /** Sample 0's payload alone — the poster-frame path (see
    * [[Multimodal.VideoCodec.firstFrame]]): one slice per clip, no
    * other sample touched. Null for non-MP4 bytes, zero-sample movies
    * (init segments), or clips whose ranges don't resolve — the
    * family's quarantine-whole contract. */
  def firstSample(blob: Array[Byte]): Array[Byte] =
    parseRanges(blob).flatMap { case (_, offs, lens) =>
      if (offs.isEmpty) None else Some(slice(blob, offs(0), lens(0)))
    }.orNull

  /** Per-sample mean of pixel channel 0 (exact for solid fills), via
    * the same ImageIO decode as [[Multimodal.ImageCodec]]. Null if the
    * container or ANY sample fails to decode — a partially-readable
    * clip quarantines whole, like corrupt bytes (the
    * [[Multimodal.VideoCodec.frameMeans]] contract). Streaming
    * per-sample cursor: each sample decodes zero-copy from its blob
    * range ([[Multimodal.ImageCodec.channelMeansAt]]) and nothing but
    * the current raster is live, so a long clip costs blob + one
    * frame of peak memory, not blob + all sample copies. */
  def frameMeans(blob: Array[Byte]): Array[Double] =
    parseRanges(blob).flatMap { case (_, offs, lens) =>
      val means = new Array[Double](offs.length)
      var i = 0
      var ok = true
      while (ok && i < offs.length) {
        val m = Multimodal.ImageCodec.channelMeansAt(
          blob, offs(i).toInt, lens(i))
        if (m == null) ok = false
        else { means(i) = m(0); i += 1 }
      }
      if (ok) Some(means) else None
    }.orNull

  /** Deterministic keyframe decimation: keep every `stride`-th sample
    * and re-encode the container (timescale unchanged — the sampled
    * clip is shorter, exactly ceil(n/stride) samples), mirroring
    * [[Multimodal.VideoCodec.decimate]]. Copies only the KEPT samples.
    * Null (quarantine) for a zero-sample movie — e.g. a DASH init
    * segment (moov with an empty stbl and no fragments), which parses
    * as valid metadata but holds nothing to decimate; re-encoding it
    * would throw per row instead of quarantining. */
  def decimate(blob: Array[Byte], stride: Int): Array[Byte] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    parseRanges(blob).flatMap { case (m, offs, lens) =>
      if (offs.isEmpty) None
      else Some(encodeMp4(
        (0 until offs.length by stride).map(i => slice(blob, offs(i), lens(i))),
        m.width, m.height, m.timescale))
    }.orNull
  }

  /** Solid-fill fixture: `nFrames` gray samples at `fps`; samples
    * before `cutIdx` fill `vA`, from `cutIdx` on fill `vB` (cutIdx<0 =
    * no cut). Every statistic is exactly computable in the SQL oracle
    * from the parameters — the MP4 twin of
    * [[Multimodal.VideoCodec.encodeSolidAvi]] (at most TWO distinct
    * PNG encodes per clip, same reuse note). */
  def encodeSolidMp4(nFrames: Int, w: Int, h: Int, fps: Int,
      cutIdx: Int, vA: Int, vB: Int): Array[Byte] = {
    val pngA = Multimodal.ImageCodec.encodePng(w, h, vA, vA, vA)
    lazy val pngB = Multimodal.ImageCodec.encodePng(w, h, vB, vB, vB)
    encodeMp4((0 until nFrames).map { i =>
      if (cutIdx >= 0 && i >= cutIdx) pngB else pngA
    }, w, h, fps)
  }

  /** Pattern MP4 fixture (the temporal analogue of the pattern PNG/WAV/
    * AVI encoders): 64 solid gray samples, sample i filled `hi` when
    * bit i of `pattern` is set, else `lo` — so [[frameMeans]] recovers
    * the pattern exactly and the temporal fingerprint is
    * SQL-predictable. */
  def encodePatternMp4(pattern: Long, w: Int, h: Int, fps: Int,
      hi: Int, lo: Int): Array[Byte] = {
    val pngHi = Multimodal.ImageCodec.encodePng(w, h, hi, hi, hi)
    val pngLo = Multimodal.ImageCodec.encodePng(w, h, lo, lo, lo)
    encodeMp4((0 until 64).map { i =>
      if (((pattern >>> i) & 1L) != 0L) pngHi else pngLo
    }, w, h, fps)
  }

  /** Fragmented twin of [[encodePatternMp4]] — same 64-frame pattern
    * schedule, DASH/HLS moof/mdat layout, so a mixed-container corpus
    * gate can carry the SAME perceptual content in three real layouts
    * (AVI, plain MP4, fMP4) under one container-blind oracle. */
  def encodePatternFragmentedMp4(pattern: Long, w: Int, h: Int, fps: Int,
      hi: Int, lo: Int): Array[Byte] = {
    val pngHi = Multimodal.ImageCodec.encodePng(w, h, hi, hi, hi)
    val pngLo = Multimodal.ImageCodec.encodePng(w, h, lo, lo, lo)
    encodeFragmentedMp4((0 until 64).map { i =>
      if (((pattern >>> i) & 1L) != 0L) pngHi else pngLo
    }, w, h, fps)
  }

  // ---- Column wrappers (Scala UDFs over the byte functions) ----------

  import org.apache.spark.sql.functions.udf

  val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
    .map(m => (m.width, m.height, m.nSamples, m.timescale, m.durationMs,
      m.codec)))
  val frameMeansUdf = udf((b: Array[Byte]) => Option(frameMeans(b)))
  def decimateUdf(stride: Int) = {
    require(stride >= 1, s"stride must be >= 1, got $stride") // at build
    udf((b: Array[Byte]) => Option(decimate(b, stride)))
  }
  val encodeSolidMp4Udf =
    udf((nf: Int, w: Int, h: Int, fps: Int, cut: Int, vA: Int, vB: Int) =>
      encodeSolidMp4(nf, w, h, fps, cut, vA, vB))
  val encodeSolidFragmentedMp4Udf =
    udf((nf: Int, w: Int, h: Int, fps: Int, cut: Int, vA: Int, vB: Int) =>
      encodeSolidFragmentedMp4(nf, w, h, fps, cut, vA, vB))
  val encodePatternMp4Udf =
    udf((p: Long, w: Int, h: Int, fps: Int) =>
      encodePatternMp4(p, w, h, fps, 200, 40))
  val encodePatternFragmentedMp4Udf =
    udf((p: Long, w: Int, h: Int, fps: Int) =>
      encodePatternFragmentedMp4(p, w, h, fps, 200, 40))
  val decodeAudioMetaUdf = udf((b: Array[Byte]) => Option(decodeAudioMeta(b))
    .map(m => (m.channels, m.bits, m.sampleRate, m.nSamples, m.durationMs,
      m.codec)))
  val extractAudioWavUdf = udf((b: Array[Byte]) => Option(extractAudioWav(b)))
  val encodeSolidMp4WithAudioUdf = // little-endian 'sowt' samples
    udf((nf: Int, w: Int, h: Int, fps: Int, va: Int, af: Int, rate: Int,
        ch: Int, v0: Int, v1: Int) =>
      encodeSolidMp4WithAudio(nf, w, h, fps, va, af, rate, ch, v0, v1))
  val encodeSolidMp4WithAudioBeUdf = // big-endian 'twos' samples
    udf((nf: Int, w: Int, h: Int, fps: Int, va: Int, af: Int, rate: Int,
        ch: Int, v0: Int, v1: Int) =>
      encodeSolidMp4WithAudio(nf, w, h, fps, va, af, rate, ch, v0, v1,
        audioBigEndian = true))
}
