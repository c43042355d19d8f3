package graft.multimodal

/** Container-blind video decode dispatch. Real media drops interleave
  * RIFF/AVI and ISO-BMFF MP4 files in ONE binary column, and file
  * extensions lie, so the decode stage must pick the walker per ROW
  * from the bytes themselves — the `RIFF....AVI ` magic vs a leading
  * `ftyp` box — not from a format column somebody promised upstream.
  * (Training-data pipeline extension; no reference analogue — the
  * public magic numbers are the RIFF spec's and ISO/IEC 14496-12's.)
  *
  * Same contract as every codec in [[Multimodal]]: per-row byte→value
  * UDFs in the scan projection, NULL quarantine (an unrecognized or
  * corrupt container is null, never an exception), no shuffle. The
  * dispatch itself reads 12 bytes; the cost is whichever walker runs.
  */
object MediaSniff {

  /** Unified container metadata across both walkers: `rate` is the
    * AVI fps / MP4 media timescale (the same number for fixtures that
    * write one tick per frame), `container` names the walker that
    * decoded the row — the triage column a mixed-drop first scan
    * groups by. */
  final case class UnifiedMeta(width: Int, height: Int, nFrames: Int,
      rate: Int, durationMs: Long, codec: String, container: String)

  /** "avi" / "mp4" from the leading magic bytes, null otherwise —
    * exactly the gates the two walkers themselves check first, so a
    * sniff match that later fails to parse still quarantines
    * identically to calling that walker directly. */
  def container(blob: Array[Byte]): String =
    if (blob == null || blob.length < 12) null
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'A' && blob(9) == 'V' &&
      blob(10) == 'I' && blob(11) == ' ') "avi"
    else if (blob(4) == 'f' && blob(5) == 't' && blob(6) == 'y' &&
      blob(7) == 'p') "mp4"
    else null

  def decodeMeta(blob: Array[Byte]): UnifiedMeta = container(blob) match {
    case "avi" =>
      Option(Multimodal.VideoCodec.decodeMeta(blob)).map(m =>
        UnifiedMeta(m.width, m.height, m.nFrames, m.fps, m.durationMs,
          m.codec, "avi")).orNull
    case "mp4" =>
      Option(Mp4Codec.decodeMeta(blob)).map(m =>
        UnifiedMeta(m.width, m.height, m.nSamples, m.timescale,
          m.durationMs, m.codec, "mp4")).orNull
    case _ => null
  }

  /** Per-frame channel-0 means through whichever walker the bytes
    * claim — the input to the shared temporal hash
    * ([[Multimodal.meansHash]]), which is what makes near-dup
    * detection find an AVI re-encode of an MP4 original. */
  def frameMeans(blob: Array[Byte]): Array[Double] = container(blob) match {
    case "avi" => Multimodal.VideoCodec.frameMeans(blob)
    case "mp4" => Mp4Codec.frameMeans(blob)
    case _ => null
  }

  /** Frame 0's payload through whichever walker the bytes claim —
    * the poster-frame extraction a thumbnail / cross-modal dedup scan
    * runs: ONE frame slice per clip regardless of clip length (both
    * walkers resolve ranges without materializing other frames), so
    * poster dedup over a 100 TB video corpus costs 1/nFrames of a
    * full decode. */
  def posterFrame(blob: Array[Byte]): Array[Byte] = container(blob) match {
    case "avi" => Multimodal.VideoCodec.firstFrame(blob)
    case "mp4" => Mp4Codec.firstSample(blob)
    case _ => null
  }

  /** 64-bit aHash of the poster frame — the cross-modal fingerprint:
    * computed by the SAME [[Multimodal.ImageCodec.aHash]] an image
    * column uses, so one banded hamming join finds image↔video
    * near-dups (a video whose poster duplicates a corpus image —
    * train/eval leakage through extracted keyframes). Null quarantine
    * throughout. */
  def posterHash(blob: Array[Byte]): java.lang.Long = {
    val f = posterFrame(blob)
    if (f == null) null else Multimodal.ImageCodec.aHash(f)
  }

  /** Normalize any walkable clip to the plain (moov-first, unfragmented)
    * MP4 layout — the container-normalization pass a pipeline runs
    * before handing a mixed drop (AVI, non-faststart MP4, DASH
    * fragments) to downstream consumers that want ONE layout. Frame
    * payloads are carried over byte-identical; geometry and frame rate
    * come from the source metadata (the fixtures' scale=1 / one-tick
    * timing makes duration preserved exactly). Null for anything
    * unwalkable or frameless — corrupt inputs stay quarantined, they
    * don't become empty outputs. */
  def transcodeToMp4(blob: Array[Byte]): Array[Byte] = container(blob) match {
    case "avi" =>
      val m = Multimodal.VideoCodec.decodeMeta(blob)
      val fs = Multimodal.VideoCodec.frames(blob)
      if (m == null || fs == null || fs.isEmpty) null
      else Mp4Codec.encodeMp4(fs.toSeq, m.width, m.height, m.fps)
    case "mp4" =>
      val m = Mp4Codec.decodeMeta(blob)
      val fs = Mp4Codec.samples(blob)
      if (m == null || fs == null || fs.isEmpty) null
      else Mp4Codec.encodeMp4(fs.toSeq, m.width, m.height, m.timescale)
    case _ => null
  }

  /** "wav" / "aiff" / "mp4" from the leading magic bytes of an AUDIO
    * blob, null otherwise — the audio twin of [[container]]: real
    * audio drops interleave RIFF/WAVE, FORM/AIFF, and ISO-BMFF `.m4a`
    * files in one column, and extensions lie there too. */
  def audioContainer(blob: Array[Byte]): String =
    if (blob == null || blob.length < 12) null
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'A' &&
      blob(10) == 'V' && blob(11) == 'E') "wav"
    else if (blob(0) == 'F' && blob(1) == 'O' && blob(2) == 'R' &&
      blob(3) == 'M' && blob(8) == 'A' && blob(9) == 'I' &&
      blob(10) == 'F' && blob(11) == 'F') "aiff"
    else if (blob(4) == 'f' && blob(5) == 't' && blob(6) == 'y' &&
      blob(7) == 'p') "mp4"
    else null

  /** Normalize any supported audio container to bytes the ordinary
    * [[Multimodal.AudioCodec]] path decodes: WAV and AIFF pass through
    * UNTOUCHED (the JDK SPI family reads both, either byte order), an
    * ISO-BMFF file demuxes its soun track to WAV
    * ([[Mp4Codec.extractAudioWav]]). The audio twin of
    * [[transcodeToMp4]]: after this one per-row dispatch, every
    * downstream audio stage — metadata, means, peak, window energy,
    * the perceptual hash — runs container-blind. Null quarantine for
    * unrecognized or corrupt bytes. */
  def audioToDecodable(blob: Array[Byte]): Array[Byte] =
    audioContainer(blob) match {
      case "wav" | "aiff" => blob
      case "mp4" => Mp4Codec.extractAudioWav(blob)
      case _ => null
    }

  /** Poster-clip fixture: frame 0 is an 8×8-cell pattern PNG (the
    * [[Multimodal.ImageCodec.encodePatternPng]] shape, so its aHash
    * IS the pattern), frames 1..n-1 solid mid-gray — laid out in any
    * of the three containers. The deterministic fixture behind the
    * cross-modal poster-dedup gate: an image row and a video row
    * built from the same pattern must land at hamming 0. */
  def encodePosterClip(pattern: Long, nFrames: Int, fps: Int, cell: Int,
      container: String): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val poster = Multimodal.ImageCodec.encodePatternPng(pattern, cell)
    val side = 8 * cell
    val filler = Multimodal.ImageCodec.encodePng(side, side, 128, 128, 128)
    val frames = poster +: Seq.fill(nFrames - 1)(filler)
    container match {
      case "avi" => Multimodal.VideoCodec.encodeAvi(frames, side, side, fps)
      case "mp4" => Mp4Codec.encodeMp4(frames, side, side, fps)
      case "fmp4" => Mp4Codec.encodeFragmentedMp4(frames, side, side, fps)
      case other => throw new IllegalArgumentException(
        s"unknown container '$other' (avi|mp4|fmp4)")
    }
  }

  // ---- Column wrappers -------------------------------------------------

  import org.apache.spark.sql.functions.udf

  val containerUdf = udf((b: Array[Byte]) => Option(container(b)))
  val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
    .map(m => (m.width, m.height, m.nFrames, m.rate, m.durationMs,
      m.codec, m.container)))
  val frameMeansUdf = udf((b: Array[Byte]) => Option(frameMeans(b)))
  val posterHashUdf =
    udf((b: Array[Byte]) => Option(posterHash(b)).map(_.longValue))
  val audioContainerUdf = udf((b: Array[Byte]) => Option(audioContainer(b)))
  val audioToDecodableUdf =
    udf((b: Array[Byte]) => Option(audioToDecodable(b)))
  val transcodeToMp4Udf = udf((b: Array[Byte]) => Option(transcodeToMp4(b)))
  val encodePosterClipUdf =
    udf((p: Long, nf: Int, fps: Int, cell: Int, c: String) =>
      encodePosterClip(p, nf, fps, cell, c))
}
