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

  // ---- Column wrappers -------------------------------------------------

  import org.apache.spark.sql.functions.udf

  val containerUdf = udf((b: Array[Byte]) => Option(container(b)))
  val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
    .map(m => (m.width, m.height, m.nFrames, m.rate, m.durationMs,
      m.codec, m.container)))
  val frameMeansUdf = udf((b: Array[Byte]) => Option(frameMeans(b)))
}
