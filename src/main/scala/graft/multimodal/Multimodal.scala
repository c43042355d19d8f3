package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * IMAGES are handled by a REAL pure-JVM codec ([[ImageCodec]]):
  * `javax.imageio` ships in the JDK, so PNG/JPEG decode, per-channel
  * pixel statistics, and a deterministic integer box-filter downscale
  * all run executor-side with no external library. AUDIO likewise
  * ([[AudioCodec]]): `javax.sound.sampled` ships in the JDK — WAV/PCM
  * decode, per-channel sample statistics, integer-decimation
  * downsample. VIDEO ([[VideoCodec]]): a real RIFF/AVI container
  * walker carrying Motion-PNG frames — container metadata, frame
  * extraction, per-frame stats, scene-cut detection, keyframe
  * decimation — all pure JVM; only an interframe codec (H.264 etc.)
  * would need JNI/javacv, and swapping one in changes only the
  * per-frame byte→pixels step, not the container walk or dataflow.
  *
  * Every stage here is a narrow per-row transformation that never
  * shuffles, which is what makes this viable over 100 TB of media — the
  * only shuffles in a media pipeline should be the caller's
  * joins/groupBys, never the decode itself. Decode parallelism is
  * partition parallelism: N executors × M cores decode N×M blobs at a
  * time wherever the rows already live.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  /** Wrap a raw binary column with metadata (sizes from the bytes, the
    * rest caller-supplied or unknown). */
  def withMediaMeta(df: DataFrame, blobCol: String, mediaType: String,
      codec: String = "raw"): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      lit(codec).as("codec"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"),
      length(col(blobCol)).cast(LongType).as("size_bytes")))

  /** REAL image codec on `javax.imageio` (in the JDK — no external
    * dependency): decode PNG/JPEG blobs executor-side, extract typed
    * metadata and per-channel pixel statistics, and downscale with a
    * deterministic integer box filter. Each function is a per-row
    * byte→value transformation exposed as a Spark UDF — a non-codegen
    * island by necessity (pixel loops have no Column form), but narrow:
    * it runs inside the scan projection, never shuffles, and
    * parallelizes per partition. */
  object ImageCodec {

    // javax.imageio defaults to DISK-caching every Image{In,Out}putStream
    // it wraps: each ImageIO.read/write on a byte stream creates (and
    // deletes) a temp file under java.io.tmpdir. Per-row temp-file churn
    // across 32 executor threads is pure overhead for in-memory blobs —
    // and the JVM-global StreamCloser registry behind it is a
    // synchronized shutdown hook that throws spurious NPEs at exit.
    // Memory-backed streams are strictly better for byte[] media columns.
    // The object initializer runs once per executor JVM when the first
    // UDF call loads the class, so the setting reaches every worker.
    javax.imageio.ImageIO.setUseCache(false)

    /** Decoded metadata: (width, height, channels, format) or null when
      * no installed reader claims the bytes or the HEADER is unreadable
      * (callers filter/quarantine on NULL — corrupt blobs are data, not
      * exceptions, at 100 TB). Deliberately header-depth: a blob with a
      * valid header but corrupt pixel data still reports its metadata
      * here — pixel-level corruption surfaces as NULL from the stages
      * that actually decode pixels (channelMeans/aHash/downscale),
      * which is where a quarantine filter belongs. */
    final case class ImageMeta(width: Int, height: Int, channels: Int,
        format: String)

    /** Decompression-bomb budget: the largest raster a single decode
      * may allocate, in BYTES. A crafted PNG header can declare
      * 60000×60000 (~10 GB of raster) while compressing to a few KB —
      * decoding it throws OutOfMemoryError, an Error that ESCAPES the
      * `case _: Exception` quarantine and can take the whole executor
      * down. The budget is byte-denominated, not pixel-denominated: a
      * 16-bit RGBA header at 64 Mpx implies a ~512 MB raster — double
      * what the same pixel count costs at 8-bit RGB — so the gate
      * multiplies header-declared pixels by the header-declared
      * bytes/pixel (band count × sample bytes from the reader's raw or
      * first advertised image type; worst-case 8 B/px assumed when the
      * header states no type). 256 MB is far above any legitimate
      * training-corpus image and far below executor headroom; blobs
      * past it quarantine as NULL at header depth, before a single
      * raster byte is allocated. */
    private val maxDecodeBytes = 1L << 28

    // Per-thread reader reuse for the decode hot path.
    // `ImageIO.getImageReaders` walks the SPI registry (each provider
    // probing the stream's magic) and instantiates a fresh reader —
    // plus its internal buffers — on EVERY call; for frame-sized
    // images (a video's 8×8 Motion-PNG payloads, thumbnails) that
    // fixed cost rivals the pixel work itself. An ImageReader is
    // reusable across inputs (`setInput` resets its state) but NOT
    // thread-safe, so cache one per (executor thread, format), keyed
    // by a magic-byte sniff for the two formats real training corpora
    // are made of — PNG (what [[VideoCodec.frameMeans]] decodes 64×
    // per row) and JPEG. Unrecognized magic takes the registry path
    // below, unchanged.
    private val readerTl: ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] =
      ThreadLocal.withInitial(() =>
        new java.util.HashMap[String, javax.imageio.ImageReader])

    /** "png" / "jpeg" from the magic bytes at `off`, else null. */
    private def sniffFormat(blob: Array[Byte], off: Int, len: Int): String =
      if (len < 8) null
      else if (blob(off) == 0x89.toByte && blob(off + 1) == 'P' &&
        blob(off + 2) == 'N' && blob(off + 3) == 'G') "png"
      else if (blob(off) == 0xff.toByte && blob(off + 1) == 0xd8.toByte &&
        blob(off + 2) == 0xff.toByte) "jpeg"
      else null

    private def cachedReader(fmt: String): javax.imageio.ImageReader = {
      val m = readerTl.get()
      var r = m.get(fmt)
      if (r == null && !m.containsKey(fmt)) {
        val rs = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        r = if (rs.hasNext) rs.next() else null
        m.put(fmt, r) // cache the miss too: absent SPI stays absent
      }
      r
    }

    // Per-thread WRITER reuse, symmetric to the reader cache above:
    // `ImageIO.write` walks the writer SPI registry and instantiates a
    // fresh ImageWriter — plus its internal buffers — on EVERY call,
    // the exact fixed cost the reader cache removed from the decode
    // side, paid here by every transcode (downscale re-encode) and
    // fixture encode. An ImageWriter is reusable across outputs
    // (`setOutput` resets it) but NOT thread-safe, so cache one per
    // (executor thread, format name as the caller spells it — "png"
    // and "jpg" key separately, both resolving through the registry
    // once).
    private val writerTl: ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] =
      ThreadLocal.withInitial(() =>
        new java.util.HashMap[String, javax.imageio.ImageWriter])

    private def cachedWriter(fmt: String): javax.imageio.ImageWriter = {
      val m = writerTl.get()
      var w = m.get(fmt)
      if (w == null && !m.containsKey(fmt)) {
        val ws = javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
        w = if (ws.hasNext) ws.next() else null
        // the null is cached too (containsKey distinguishes "negative"
        // from "never asked"), so an absent SPI skips the registry walk
        // on later calls — but encodeVia then falls through to the full
        // ImageIO.write path every time for that format, which ALSO
        // walks the registry. Acceptable: the engine only encodes
        // png/jpg, both always installed; an unknown format here means
        // a caller bug, not a hot path.
        m.put(fmt, w)
      }
      w
    }

    /** Encode through the per-thread cached writer (falling back to
      * the registry path only when no writer claims the format). The
      * writer's output is cleared in a finally — same hygiene as the
      * reader cache: a long-lived writer must not pin the last row's
      * closed stream between calls. A writer that THROWS mid-write is
      * disposed and evicted instead of re-cached: some ImageWriter
      * implementations are not cleanly reusable after an aborted
      * write, and a poisoned cache entry would fail every subsequent
      * encode on that thread — the next call re-resolves from the
      * registry. Package-private so the eviction path is testable
      * (mirroring the corrupt-blob reader-reset spec). */
    private[multimodal] def encodeVia(img: java.awt.image.RenderedImage,
        format: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = cachedWriter(format)
      if (w == null) javax.imageio.ImageIO.write(img, format, bos)
      else {
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        var failed = false
        try { w.setOutput(ios); w.write(img) }
        catch { case e: Throwable => failed = true; throw e }
        finally {
          if (failed) {
            writerTl.get().remove(format)
            try w.dispose() catch { case _: Exception => () }
          } else w.setOutput(null)
          ios.close()
        }
      }
      bos.toByteArray
    }

    /** Header-declared bytes per pixel: band count × bytes per sample,
      * taking the MAX of the raw image type and the first advertised
      * type — `read(0)` materializes the first ADVERTISED type, which
      * for some registry-path readers has more bands than raw (palette
      * or tRNS expansion: a 1-band indexed raw can decode to 4-band
      * RGBA), so gating on raw alone would under-reserve exactly when
      * the destination is wider; 8 B/px — the worst real layout,
      * 16-bit RGBA — when the header states no type at all, so an
      * unknown layout can only over-reserve, never under. Never
      * returns < 1: a pathological sample model reporting zero bands
      * must not turn the budget division into ArithmeticException. */
    private def headerBytesPerPixel(r: javax.imageio.ImageReader): Long = {
      def bpp(t: javax.imageio.ImageTypeSpecifier): Long = {
        val sm = t.getSampleModel
        // ceil(bits/8) per band: a 1/2/4-bit gray band still costs a
        // byte in the BufferedImage raster the decode materializes
        (0 until sm.getNumBands).map(b => (sm.getSampleSize(b) + 7) / 8)
          .map(_.toLong).sum
      }
      val declared = try {
        val raw = Option(r.getRawImageType(0)).map(bpp).getOrElse(0L)
        val adv = {
          val ts = r.getImageTypes(0)
          if (ts.hasNext) bpp(ts.next()) else 0L
        }
        if (raw == 0L && adv == 0L) 8L else math.max(raw, adv)
      } catch { case _: Exception => 8L }
      math.max(1L, declared)
    }

    /** Header-gated decode through ONE reader: dims come from the
      * header first, and only in-budget images reach
      * `ImageReader.read` (see [[maxDecodeBytes]]). The reader may be
      * the long-lived per-thread cached one, so its input is cleared
      * in a finally — otherwise the closed stream (and the decoded
      * blob behind it) stays pinned per (thread, format) between rows. */
    private def readVia(r: javax.imageio.ImageReader,
        iis: javax.imageio.stream.ImageInputStream): Option[java.awt.image.BufferedImage] =
      try {
        r.setInput(iis)
        val (w, h) = (r.getWidth(0), r.getHeight(0))
        val px = w.toLong * h
        if (w <= 0 || h <= 0) None
        // fast path: in budget even at the worst-case 8 B/px, so skip
        // the type probe entirely — keeps the per-row cost of normal
        // images (and the 64-per-row video frames) at two header reads
        else if (px <= maxDecodeBytes / 8) Option(r.read(0))
        else if (px > maxDecodeBytes / headerBytesPerPixel(r)) None
        else Option(r.read(0))
      } finally r.setInput(null)

    /** Full pixel decode behind every pixel-level stage, with the
      * raster allocation gated on header-declared dimensions (see
      * [[maxDecodeBytes]]): PNG/JPEG magic takes the cached
      * per-thread reader, anything else the full registry scan. */
    private def readImage(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (blob == null || blob.isEmpty) None
      else readImageAt(blob, 0, blob.length)

    /** [[readImage]] over the slice [off, off+len) WITHOUT copying it
      * out: ByteArrayInputStream's (buf, offset, length) form bounds
      * the reader to the slice against the original array. This is the
      * zero-copy per-sample decode path the container codecs stream
      * through ([[Mp4Codec.frameMeans]], [[VideoCodec.frameMeans]]): a
      * clip's frames decode one at a time straight out of the clip
      * blob, with no per-frame copyOfRange and nothing live between
      * frames but the current raster. */
    private def readImageAt(blob: Array[Byte], off: Int,
        len: Int): Option[java.awt.image.BufferedImage] =
      if (blob == null || len <= 0 || off < 0 || off > blob.length - len) None
      else try {
        val fmt = sniffFormat(blob, off, len)
        val cached = if (fmt != null) cachedReader(fmt) else null
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob, off, len))
        try {
          if (cached != null) readVia(cached, iis)
          else {
            val rs = javax.imageio.ImageIO.getImageReaders(iis)
            if (!rs.hasNext) None
            else {
              val r = rs.next()
              try readVia(r, iis) finally r.dispose()
            }
          }
        } finally iis.close()
      } catch { case _: Exception => None }

    /** Container format sniffed from the reader registry ("png",
      * "jpeg"), lowercased; None when no reader claims the bytes. */
    private def formatOf(blob: Array[Byte]): Option[String] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        try {
          val rs = javax.imageio.ImageIO.getImageReaders(iis)
          if (rs.hasNext) Some(rs.next().getFormatName.toLowerCase) else None
        } finally iis.close()
      } catch { case _: Exception => None }

    /** Full-decode metadata — the fallback for readers that cannot
      * state a raw image type from the header alone. */
    private def fullDecodeMeta(blob: Array[Byte]): ImageMeta =
      readImage(blob).map { img =>
        ImageMeta(img.getWidth, img.getHeight,
          img.getRaster.getNumBands, formatOf(blob).getOrElse("unknown"))
      }.orNull

    /** Header-only metadata read: one ImageInputStream, one reader —
      * width/height/bands/format all come from the container header
      * without decoding a single pixel, so a metadata-only scan over an
      * image column costs header bytes per row, not a full raster
      * decode. When NO reader claims the bytes the row is null
      * immediately (a second full-decode pass against the same registry
      * would be guaranteed-null work on exactly the corrupt rows a
      * 100 TB scan quarantines in bulk); the full-decode fallback runs
      * only for readers that cannot state an image type header-only. */
    def decodeMeta(blob: Array[Byte]): ImageMeta =
      if (blob == null || blob.isEmpty) null
      else try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        try {
          val rs = javax.imageio.ImageIO.getImageReaders(iis)
          if (!rs.hasNext) null // nothing claims the bytes: quarantine
          else {
            val r = rs.next()
            try {
              r.setInput(iis)
              val bands = {
                val raw = r.getRawImageType(0)
                if (raw != null) raw.getNumBands
                else {
                  val ts = r.getImageTypes(0)
                  if (ts.hasNext) ts.next().getNumBands else -1
                }
              }
              if (bands >= 0)
                ImageMeta(r.getWidth(0), r.getHeight(0), bands,
                  r.getFormatName.toLowerCase)
              else fullDecodeMeta(blob)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => fullDecodeMeta(blob) }

    private def meansOf(img: java.awt.image.BufferedImage): Array[Double] = {
      val r = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
      val sums = new Array[Long](bands)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sums(b) += r.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      sums.map(_.toDouble / (w.toLong * h))
    }

    /** Per-channel pixel means as doubles (integer sums divided once —
      * exact for solid fills, deterministic always). Null for
      * undecodable bytes. */
    def channelMeans(blob: Array[Byte]): Array[Double] =
      readImage(blob).map(meansOf).orNull

    /** [[channelMeans]] over the slice [off, off+len) of `blob`,
      * decoded zero-copy (see [[readImageAt]]) — the per-frame step of
      * the container codecs' streaming decode cursors. */
    private[multimodal] def channelMeansAt(blob: Array[Byte], off: Int,
        len: Int): Array[Double] =
      readImageAt(blob, off, len).map(meansOf).orNull

    /** Target size preserving aspect ratio: identity when the longest
      * edge already fits `maxDim`, else longest edge = maxDim (each edge
      * ≥ 1). Mirrors the formula the oracle replays in SQL. */
    def scaledDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
      val m = math.max(w, h)
      if (m <= maxDim) (w, h)
      else (math.max(1, math.round(w.toDouble * maxDim / m).toInt),
        math.max(1, math.round(h.toDouble * maxDim / m).toInt))
    }

    /** Deterministic downscale: integer box filter (each target pixel =
      * truncated mean of its source box — pure integer arithmetic, so
      * the result is identical across JVMs/platforms, unlike
      * Graphics2D's interpolation), re-encoded as PNG (lossless).
      * Identity-size images still round-trip through the filter so the
      * output is uniformly PNG. Null for undecodable bytes. */
    def downscale(blob: Array[Byte], maxDim: Int): Array[Byte] = {
      require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
      readImage(blob).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val (tw, th) = scaledDims(w, h, maxDim)
        val src = img.getRaster
        val bands = math.min(3, src.getNumBands)
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val dst = out.getRaster
        var ty = 0
        while (ty < th) {
          val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
          var tx = 0
          while (tx < tw) {
            val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
            var b = 0
            while (b < 3) {
              val sb = math.min(b, bands - 1) // gray replicates to RGB
              var sum = 0L; var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) { sum += src.getSample(x, y, sb); x += 1 }
                y += 1
              }
              dst.setSample(tx, ty, b,
                (sum / ((x1 - x0).toLong * (y1 - y0))).toInt)
              b += 1
            }
            tx += 1
          }
          ty += 1
        }
        encodeVia(out, "png")
      }.orNull
    }

    /** 64-bit average-hash (aHash) perceptual fingerprint: decode →
      * integer box-downscale to 8×8 → per-cell luma (299/587/114
      * milli-weights, integer) → bit i set iff cell i's luma exceeds the
      * 64-cell mean. Classic perceptual-dedup signature: resize/re-encode
      * variants of an image land within a few bits, so near-duplicate
      * detection over a binary image column is
      * aHashUdf → [[graft.text.DedupOps.fingerprintPairs]] — the same
      * pigeonhole-banded hamming join the text side uses, no quadratic
      * stage. Null for undecodable bytes. */
    def aHash(blob: Array[Byte]): java.lang.Long =
      readImage(blob).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val src = img.getRaster
        val bands = src.getNumBands
        val luma = new Array[Long](64)
        var cy = 0
        while (cy < 8) {
          val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
          var cx = 0
          while (cx < 8) {
            val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
            var sum = 0L; var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                sum +=
                  (if (bands >= 3)
                    299L * src.getSample(x, y, 0) +
                      587L * src.getSample(x, y, 1) +
                      114L * src.getSample(x, y, 2)
                  else 1000L * src.getSample(x, y, 0))
                x += 1
              }
              y += 1
            }
            luma(cy * 8 + cx) = sum / ((x1 - x0).toLong * (y1 - y0))
            cx += 1
          }
          cy += 1
        }
        val mean = luma.sum / 64
        var hash = 0L; var i = 0
        while (i < 64) { if (luma(i) > mean) hash |= 1L << i; i += 1 }
        java.lang.Long.valueOf(hash)
      }.orNull

    /** Per-pixel fill contract for [[encodeFilled]]. An abstract class
      * with a primitive-typed `apply`, NOT a `(Int,Int,Int) => Int`:
      * Scala's FunctionN is not `@specialized` beyond arity 2, so a
      * Function3 fill would box three Int arguments plus the result on
      * every pixel call (values > 127 miss the Integer cache) — a
      * per-pixel allocation in encoders that run per ROW inside
      * measured gate projections. Call sites still pass a lambda (SAM
      * conversion), but the generated `apply(III)I` stays unboxed. */
    private[multimodal] abstract class PixelFill {
      def apply(x: Int, y: Int, band: Int): Int
    }

    /** One fill-and-encode loop behind every fixture encoder: per-pixel
      * band value from `fill(x, y, band)` — see [[PixelFill]] for why
      * the closure type keeps the pixel loop allocation-free. */
    private def encodeFilled(w: Int, h: Int, format: String)(
        fill: PixelFill): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, fill(x, y, 0))
          raster.setSample(x, y, 1, fill(x, y, 1))
          raster.setSample(x, y, 2, fill(x, y, 2))
          x += 1
        }
        y += 1
      }
      encodeVia(img, format)
    }

    /** 8×8-cell black/white pattern PNG (cell i white iff bit i of
      * `pattern`; `cell` pixels per cell edge) — the deterministic
      * fixture for perceptual-hash specs/gates: box-downscale recovers
      * each cell exactly, so `aHash(encodePatternPng(p)) == p` for any
      * p with at least one zero bit (all-ones has no cell above the
      * mean). */
    def encodePatternPng(pattern: Long, cell: Int = 4): Array[Byte] =
      encodeFilled(8 * cell, 8 * cell, "png") { (x, y, _) =>
        val bit = (y / cell) * 8 + (x / cell)
        if (((pattern >>> bit) & 1L) == 1L) 255 else 0
      }

    /** Solid-fill PNG encoder — the deterministic fixture generator for
      * specs/gates (solid fills make every pixel statistic exactly
      * computable in the SQL oracle). */
    def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
      encodeFilled(w, h, "png")((_, _, band) =>
        if (band == 0) r else if (band == 1) g else b)

    /** Solid PNG with the IDAT payload's leading bytes zeroed — the
      * raster-depth quarantine probe: the chunk STRUCTURE stays intact
      * (lengths, IEND, header chunks untouched), so header-depth
      * metadata reads fine, but the zlib stream inside IDAT turns
      * invalid (a zero CMF byte fails inflate immediately) and every
      * pixel-level stage quarantines with NULL. Truncation cannot
      * model this depth for PNG: the reader's type probing walks the
      * chunk list to IEND, so a tail-cut file fails at HEADER depth
      * too. Zeroing is bounded by the IDAT chunk's declared length so
      * the corruption never bleeds into the CRC-following IEND. */
    def encodeRasterCorruptPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val full = encodePng(w, h, r, g, b)
      val idat = full.indexOfSlice("IDAT".getBytes("US-ASCII"))
      require(idat >= 4, "encoded PNG lacks an IDAT chunk")
      val declared = ((full(idat - 4) & 0xff) << 24) |
        ((full(idat - 3) & 0xff) << 16) |
        ((full(idat - 2) & 0xff) << 8) | (full(idat - 1) & 0xff)
      val out = full.clone()
      (idat + 4 until idat + 4 + math.min(declared, 20)).foreach(out(_) = 0)
      out
    }

    /** JPEG encoder (default quality) — exercises the lossy decode path
      * in specs; pixel stats are approximate there by nature. */
    def encodeJpeg(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
      encodeFilled(w, h, "jpg")((_, _, band) =>
        if (band == 0) r else if (band == 1) g else b)

    // ---- Column wrappers (Scala UDFs over the byte functions) ----------

    import org.apache.spark.sql.functions.udf

    val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
      .map(m => (m.width, m.height, m.channels, m.format)))
    val channelMeansUdf = udf((b: Array[Byte]) => Option(channelMeans(b)))
    def downscaleUdf(maxDim: Int) = {
      require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim") // at build
      udf((b: Array[Byte]) => Option(downscale(b, maxDim)))
    }
    val encodePngUdf =
      udf((w: Int, h: Int, r: Int, g: Int, b: Int) => encodePng(w, h, r, g, b))
    val encodeRasterCorruptPngUdf =
      udf((w: Int, h: Int, r: Int, g: Int, b: Int) =>
        encodeRasterCorruptPng(w, h, r, g, b))
    val aHashUdf = udf((b: Array[Byte]) => Option(aHash(b)).map(_.longValue))
    val encodePatternPngUdf =
      udf((p: Long, cell: Int) => encodePatternPng(p, cell))
  }

  /** REAL audio codec on `javax.sound.sampled` (in the JDK — no
    * external dependency): decode WAV (RIFF/PCM) blobs executor-side,
    * extract typed metadata and per-channel sample statistics, and
    * downsample by integer frame decimation. Same contract as
    * [[ImageCodec]]: per-row byte→value UDFs (non-codegen islands by
    * necessity — sample loops have no Column form) that run inside the
    * scan projection, never shuffle, and parallelize per partition;
    * undecodable bytes become NULL (quarantine is the caller's filter),
    * never exceptions. */
  object AudioCodec {

    /** Decoded metadata, or null for bytes no installed reader
      * understands. `durationMs` = frames * 1000 / sampleRate with
      * integer division — the SQL-replayable formula. */
    final case class AudioMeta(sampleRate: Int, channels: Int,
        bitsPerSample: Int, frames: Long, durationMs: Long, format: String)

    // The AudioSystem facade re-resolves its SPI providers through a
    // synchronized, JVM-global registry on EVERY getAudioInputStream /
    // write call. Per-row decodes across 32 executor threads convoy on
    // that lock and serialize the whole stage (measured: the audio gate
    // ran 30× slower per row than the image gate doing strictly more
    // work). Resolve the same providers ONCE via the public ServiceLoader
    // SPI (java.desktop declares them as `provides AudioFileReader/
    // Writer`) and dispatch to them directly — identical decoders,
    // no global lock in the hot path.
    private lazy val fileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator.asScala.toSeq
    }
    private lazy val fileWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator.asScala.toSeq
    }

    // Last reader that decoded successfully, tried first on the next
    // call. Two reasons this is the 100 TB-relevant fast path and not a
    // micro-optimization (both measured by tools/ProfAudio): (1) the
    // readers REJECT by throwing, so walking the list front-to-back
    // pays several exception fills per decode; (2) the JDK's
    // SoftMidiAudioFileReader sits BEFORE WaveFileReader in SPI order
    // and probes via MidiSystem — which takes the same synchronized
    // JVM-global provider registry the facade does, convoying all 32
    // executor threads (32-thread aggregate throughput measured BELOW
    // single-thread before this hint). A media column is homogeneous in
    // practice, so the hint converges after one row and every
    // subsequent decode is a single direct reader call.
    @volatile private var readerHint: javax.sound.sampled.spi.AudioFileReader = null

    private def readStream(blob: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
      if (blob == null || blob.isEmpty) None
      else {
        val in = new java.io.ByteArrayInputStream(blob)
        def tryRead(r: javax.sound.sampled.spi.AudioFileReader) = {
          in.reset()
          try Option(r.getAudioInputStream(in))
          catch { case _: Exception => None }
        }
        val hinted = readerHint
        val fast = if (hinted != null) tryRead(hinted) else None
        fast.orElse {
          fileReaders.iterator.filter(_ ne hinted).flatMap { r =>
            tryRead(r).map { s => readerHint = r; s }
          }.nextOption()
        }
      }

    def decodeMeta(blob: Array[Byte]): AudioMeta =
      readStream(blob).map { in =>
        try {
          val f = in.getFormat
          val frames = in.getFrameLength
          val rate = math.round(f.getSampleRate)
          // frames can be NOT_SPECIFIED (-1) for streamed formats; a
          // negative count must surface as the -1 duration sentinel,
          // not as -1000/rate = "0 ms" masquerading as an empty clip
          AudioMeta(rate, f.getChannels, f.getSampleSizeInBits, frames,
            if (rate > 0 && frames >= 0) frames * 1000L / rate else -1L,
            f.getEncoding.toString.toLowerCase)
        } finally in.close()
      }.orNull

    /** Fully read a 16-bit signed PCM stream into per-frame channel
      * samples — BOTH byte orders, because the two containers the JDK
      * decodes disagree: WAV is little-endian, AIFF big-endian, and a
      * real mixed audio drop carries both. None for anything else
      * (other encodings quarantine as null like corrupt bytes — a
      * 100 TB pipeline filters, it doesn't throw). */
    private def readPcm16(blob: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
      readStream(blob).flatMap { in =>
        try {
          val f = in.getFormat
          val ok = f.getSampleSizeInBits == 16 &&
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!ok) None
          else {
            val bytes = in.readAllBytes()
            val out = new Array[Short](bytes.length / 2)
            val big = f.isBigEndian
            var i = 0
            while (i < out.length) {
              out(i) =
                if (big) (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
                else ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
              i += 1
            }
            Some((f, out))
          }
        } finally in.close()
      }

    /** Per-channel mean sample value (exact for constant fills,
      * deterministic always — integer sums divided once). Null for
      * undecodable / non-PCM16 bytes. */
    def channelMeans(blob: Array[Byte]): Array[Double] =
      readPcm16(blob).map { case (f, samples) =>
        val ch = f.getChannels
        val sums = new Array[Long](ch)
        var i = 0
        while (i < samples.length) { sums(i % ch) += samples(i); i += 1 }
        val frames = math.max(1, samples.length / ch)
        sums.map(_.toDouble / frames)
      }.orNull

    /** Peak |sample| across all channels (clip / loudness scan). */
    def peak(blob: Array[Byte]): java.lang.Integer =
      readPcm16(blob).map { case (_, samples) =>
        var m = 0; var i = 0
        while (i < samples.length) {
          val a = math.abs(samples(i).toInt); if (a > m) m = a; i += 1
        }
        java.lang.Integer.valueOf(m)
      }.orNull

    /** Deterministic downsample: keep every `factor`-th frame (pure
      * integer decimation — identical across JVMs; a real resampler's
      * interpolation kernel would replace just this loop), re-encoded as
      * PCM16 WAV at sampleRate/factor via the JDK writer. Null for
      * undecodable / non-PCM16 bytes. */
    def downsample(blob: Array[Byte], factor: Int): Array[Byte] = {
      // parameter errors fail FAST and LOUD (they are caller bugs, not
      // data): factor 0 would otherwise surface as a per-row
      // ArithmeticException inside the UDF — a task failure dressed up
      // as a data problem. Data errors still quarantine as null.
      require(factor >= 1, s"factor must be >= 1, got $factor")
      readPcm16(blob).map { case (f, samples) =>
        val ch = f.getChannels
        val frames = samples.length / ch
        val outFrames = (frames + factor - 1) / factor
        val out = new Array[Byte](outFrames * ch * 2)
        var of = 0
        while (of < outFrames) {
          var c = 0
          while (c < ch) {
            val s = samples(of * factor * ch + c)
            out((of * ch + c) * 2) = (s & 0xff).toByte
            out((of * ch + c) * 2 + 1) = ((s >> 8) & 0xff).toByte
            c += 1
          }
          of += 1
        }
        writeWav(out, f.getSampleRate / factor, ch)
      }.orNull
    }

    /** PCM16 WAV bytes via the JDK encoder (AudioSystem.write — the
      * same writer real pipelines use; deterministic for given PCM). */
    // package-private: [[Mp4Codec.extractAudioWav]] re-wraps a demuxed
    // MP4 PCM track through the same writer
    private[multimodal] def writeWav(pcm: Array[Byte], rate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate, 16, channels, channels * 2, rate, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / (channels * 2))
      val bos = new java.io.ByteArrayOutputStream()
      val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
      // same encoder AudioSystem.write dispatches to, minus the
      // synchronized per-call provider lookup (see fileReaders above)
      val w = fileWriters.find(_.isFileTypeSupported(t, in)).getOrElse(
        throw new IllegalStateException("no WAVE AudioFileWriter installed"))
      w.write(in, t, bos)
      bos.toByteArray
    }

    /** Constant-fill WAV encoder — the deterministic fixture generator
      * for specs/gates (channel c holds `values(c)` in every frame, so
      * every statistic is exactly computable in the SQL oracle). */
    def encodeWav(frames: Int, sampleRate: Int, values: Array[Short]): Array[Byte] = {
      require(values.nonEmpty, "values must carry at least one channel")
      require(frames >= 0, s"frames must be >= 0, got $frames")
      val ch = values.length
      val pcm = new Array[Byte](frames * ch * 2)
      var fIdx = 0
      while (fIdx < frames) {
        var c = 0
        while (c < ch) {
          val s = values(c)
          pcm((fIdx * ch + c) * 2) = (s & 0xff).toByte
          pcm((fIdx * ch + c) * 2 + 1) = ((s >> 8) & 0xff).toByte
          c += 1
        }
        fIdx += 1
      }
      writeWav(pcm, sampleRate.toFloat, ch)
    }

    /** Per-window mean of channel-0 samples over `windows` equal splits
      * of the clip — the audio analogue of an image's cell lumas: the
      * input to a 64-bit energy-hash perceptual fingerprint (window
      * mean vs clip mean), computed Column-side so the comparison stays
      * in codegen. Exact for per-window constant fills. Null for
      * undecodable / non-PCM16 bytes or clips shorter than `windows`
      * frames. */
    def windowMeans(blob: Array[Byte], windows: Int): Array[Double] = {
      // caller-bug guard (see downsample): windows < 0 would throw
      // NegativeArraySizeException per row instead of failing at build
      require(windows >= 1, s"windows must be >= 1, got $windows")
      readPcm16(blob).flatMap { case (f, samples) =>
        val ch = f.getChannels
        val frames = samples.length / ch
        if (frames < windows) None
        else Some {
          val out = new Array[Double](windows)
          var w = 0
          while (w < windows) {
            val f0 = w.toLong * frames / windows
            val f1 = math.max(f0 + 1, (w + 1).toLong * frames / windows)
            var sum = 0L; var i = f0
            while (i < f1) { sum += samples((i * ch).toInt); i += 1 }
            out(w) = sum.toDouble / (f1 - f0)
            w += 1
          }
          out
        }
      }.orNull
    }

    /** Constant-fill AIFF encoder — the big-endian container twin of
      * [[encodeWav]] (same JDK SPI family: `AiffFileWriter`). An AIFF
      * clip decodes through the identical reader walk and, with
      * [[readPcm16]] byte-order-aware, yields the SAME sample values —
      * which is what lets a mixed WAV/AIFF gate share one oracle. */
    def encodeAiff(frames: Int, sampleRate: Int, values: Array[Short]): Array[Byte] = {
      require(values.nonEmpty, "values must carry at least one channel")
      require(frames >= 0, s"frames must be >= 0, got $frames")
      val ch = values.length
      val pcm = new Array[Byte](frames * ch * 2)
      var fIdx = 0
      while (fIdx < frames) {
        var c = 0
        while (c < ch) {
          val s = values(c)
          pcm((fIdx * ch + c) * 2) = ((s >> 8) & 0xff).toByte // big-endian
          pcm((fIdx * ch + c) * 2 + 1) = (s & 0xff).toByte
          c += 1
        }
        fIdx += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, ch, ch * 2, sampleRate.toFloat, true)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      val t = javax.sound.sampled.AudioFileFormat.Type.AIFF
      val w = fileWriters.find(_.isFileTypeSupported(t, in)).getOrElse(
        throw new IllegalStateException("no AIFF AudioFileWriter installed"))
      w.write(in, t, bos)
      bos.toByteArray
    }

    /** 8-bit UNSIGNED mono WAV fixture — the PCM-depth quarantine
      * probe: every installed reader decodes its header fine
      * (decodeMeta reports rate/channels/bits=8), but [[readPcm16]]
      * rejects the encoding, so the sample-level stages quarantine
      * with NULL. Models the non-PCM16 content a real mixed-audio
      * drop contains — corruption BELOW the header, which a
      * stage-attributed quarantine report must distinguish from
      * unreadable bytes. */
    def encodeWav8(frames: Int, sampleRate: Int, value: Int): Array[Byte] = {
      require(frames >= 0, s"frames must be >= 0, got $frames")
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
      val pcm = Array.fill(frames)((value & 0xff).toByte)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val w = fileWriters.find(_.isFileTypeSupported(t, in)).getOrElse(
        throw new IllegalStateException("no WAVE AudioFileWriter installed"))
      w.write(in, t, bos)
      bos.toByteArray
    }

    /** Pattern WAV fixture encoder (the audio analogue of
      * [[ImageCodec]]'s pattern PNG): 64 equal windows of mono PCM16 at
      * 8 kHz, window i filled with amplitude `hi` when bit i of
      * `pattern` is set, else `lo` — so [[windowMeans]] recovers the
      * pattern exactly and every fingerprint bit is SQL-predictable. */
    def encodePatternWav(pattern: Long, samplesPerWindow: Int,
        hi: Short, lo: Short): Array[Byte] = {
      require(samplesPerWindow >= 1,
        s"samplesPerWindow must be >= 1, got $samplesPerWindow")
      val pcm = new Array[Byte](64 * samplesPerWindow * 2)
      var w = 0
      while (w < 64) {
        val v: Short = if (((pattern >>> w) & 1L) != 0L) hi else lo
        var s = 0
        while (s < samplesPerWindow) {
          val o = (w * samplesPerWindow + s) * 2
          pcm(o) = (v & 0xff).toByte
          pcm(o + 1) = ((v >> 8) & 0xff).toByte
          s += 1
        }
        w += 1
      }
      writeWav(pcm, 8000f, 1)
    }

    // ---- Column wrappers (Scala UDFs over the byte functions) ----------

    import org.apache.spark.sql.functions.udf

    val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
      .map(m => (m.sampleRate, m.channels, m.bitsPerSample, m.frames,
        m.durationMs, m.format)))
    val channelMeansUdf = udf((b: Array[Byte]) => Option(channelMeans(b)))
    val peakUdf = udf((b: Array[Byte]) => Option(peak(b)).map(_.intValue))
    def downsampleUdf(factor: Int) = {
      require(factor >= 1, s"factor must be >= 1, got $factor") // at build
      udf((b: Array[Byte]) => Option(downsample(b, factor)))
    }
    val encodeWavUdf = udf((frames: Int, rate: Int, v0: Int, v1: Int, ch: Int) =>
      encodeWav(frames, rate,
        if (ch >= 2) Array(v0.toShort, v1.toShort) else Array(v0.toShort)))
    val encodeWav8Udf = udf((frames: Int, rate: Int, v: Int) =>
      encodeWav8(frames, rate, v))
    val encodeAiffUdf = udf((frames: Int, rate: Int, v0: Int, v1: Int, ch: Int) =>
      encodeAiff(frames, rate,
        if (ch >= 2) Array(v0.toShort, v1.toShort) else Array(v0.toShort)))
    def windowMeansUdf(windows: Int) = {
      require(windows >= 1, s"windows must be >= 1, got $windows") // at build
      udf((b: Array[Byte]) => Option(windowMeans(b, windows)))
    }
    def encodePatternWavUdf(samplesPerWindow: Int) = {
      require(samplesPerWindow >= 1,
        s"samplesPerWindow must be >= 1, got $samplesPerWindow") // at build
      udf((p: Long) => encodePatternWav(p, samplesPerWindow, 20000, 1000))
    }
  }

  /** REAL video container codec, pure JVM: RIFF/AVI (the public
    * Microsoft AVI 1.0 container layout — `RIFF('AVI ')` with `hdrl`
    * (avih + strl/strh/strf) headers, a `movi` frame list, and an
    * `idx1` index) carrying one PNG per frame (Motion-PNG, fourcc
    * `MPNG` — a registered VfW codec id). Both layers are real,
    * parseable formats: the container walker below reads any
    * spec-shaped AVI's geometry/fps/frame chunks, and each frame is
    * decoded by the JDK's ImageIO exactly like [[ImageCodec]]. What the
    * JDK does NOT ship is an interframe codec (H.264 etc.) — swapping
    * one in (JNI/javacv) replaces only the per-frame byte→pixels step,
    * not the container walk or the dataflow. Same contract as the other
    * codecs: per-row byte→value UDFs that run inside the scan
    * projection, never shuffle, and parallelize per partition;
    * undecodable bytes become NULL (quarantine is the caller's
    * filter), never exceptions. */
  object VideoCodec {

    // Frame payloads round-trip through javax.imageio (Motion-PNG); make
    // sure the memory-backed-stream setting (see [[ImageCodec]]) is
    // applied even when a video UDF is the first codec touched in the
    // executor JVM.
    javax.imageio.ImageIO.setUseCache(false)

    /** Decoded container metadata, or null for bytes that are not a
      * spec-shaped AVI. `durationMs` = nFrames * 1000 * scale / rate
      * with integer division — the SQL-replayable formula (fps =
      * rate/scale; the fixture writes scale=1). */
    final case class VideoMeta(width: Int, height: Int, nFrames: Int,
        fps: Int, durationMs: Long, codec: String)

    // ---- RIFF plumbing (little-endian, word-aligned chunks) ----------

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(id.getBytes("US-ASCII")); bos.write(le32(data.length))
      bos.write(data)
      if ((data.length & 1) == 1) bos.write(0) // RIFF chunks word-align
      bos.toByteArray
    }

    private def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("LIST".getBytes("US-ASCII")); bos.write(le32(4 + body.length))
      bos.write(listType.getBytes("US-ASCII")); bos.write(body)
      bos.toByteArray
    }

    /** Write an AVI holding `frames` (each already-encoded PNG bytes)
      * at `fps`, with full avih/strh/strf headers and an idx1 index —
      * readable by any AVI-aware tool that knows the MPNG fourcc. */
    def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
      require(fps > 0, "fps must be positive")
      val avih = {
        val d = new java.io.ByteArrayOutputStream()
        d.write(le32(1000000 / fps)) // dwMicroSecPerFrame
        d.write(le32(0)); d.write(le32(0)) // maxBytesPerSec, padding
        d.write(le32(0x10)) // dwFlags: AVIF_HASINDEX
        d.write(le32(frames.length)) // dwTotalFrames
        d.write(le32(0)); d.write(le32(1)) // initialFrames, dwStreams
        d.write(le32(0)) // suggestedBufferSize
        d.write(le32(w)); d.write(le32(h))
        (0 until 4).foreach(_ => d.write(le32(0))) // dwReserved
        chunk("avih", d.toByteArray)
      }
      val strh = {
        val d = new java.io.ByteArrayOutputStream()
        d.write("vids".getBytes("US-ASCII")) // fccType
        d.write("MPNG".getBytes("US-ASCII")) // fccHandler
        d.write(le32(0)); d.write(le32(0)) // flags, prio+lang
        d.write(le32(0)) // initialFrames
        d.write(le32(1)); d.write(le32(fps)) // dwScale, dwRate → fps
        d.write(le32(0)); d.write(le32(frames.length)) // start, dwLength
        d.write(le32(0)); d.write(le32(-1)) // bufSize, quality
        d.write(le32(0)) // sampleSize
        d.write(le32(0)); d.write(le32((h << 16) | (w & 0xffff))) // rcFrame
        chunk("strh", d.toByteArray)
      }
      val strf = {
        val d = new java.io.ByteArrayOutputStream()
        d.write(le32(40)); d.write(le32(w)); d.write(le32(h)) // BITMAPINFOHEADER
        d.write(le32((24 << 16) | 1)) // biPlanes=1, biBitCount=24
        d.write("MPNG".getBytes("US-ASCII")) // biCompression
        d.write(le32(0)); d.write(le32(0)); d.write(le32(0))
        d.write(le32(0)); d.write(le32(0))
        chunk("strf", d.toByteArray)
      }
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val moviChunks = frames.map(f => chunk("00dc", f))
      val movi = list("movi", moviChunks.toArray.flatten)
      val idx1 = {
        val d = new java.io.ByteArrayOutputStream()
        var off = 4 // offsets conventionally count from the 'movi' fourcc
        moviChunks.zip(frames).foreach { case (c, f) =>
          d.write("00dc".getBytes("US-ASCII"))
          d.write(le32(0x10)) // AVIIF_KEYFRAME — every MPNG frame is one
          d.write(le32(off)); d.write(le32(f.length))
          off += c.length
        }
        chunk("idx1", d.toByteArray)
      }
      val body = hdrl ++ movi ++ idx1
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(4 + body.length))
      bos.write("AVI ".getBytes("US-ASCII")); bos.write(body)
      bos.toByteArray
    }

    /** Walk the RIFF tree: metadata from avih/strh, frame payload BYTE
      * RANGES from the movi list's `##dc`/`##db` chunks — no frame
      * bytes are copied here (the [[Mp4Codec.resolveRanges]] contract):
      * consumers stream per frame ([[frameMeans]]) or slice only what
      * they keep ([[decimate]]), so a long clip costs blob + one
      * raster of peak memory, not blob + every frame copy. None for
      * anything that is not a spec-shaped AVI (wrong magic, truncated
      * chunks, no movi). */
    private def parse(blob: Array[Byte]): Option[(VideoMeta, Array[(Int, Int)])] = {
      if (blob == null || blob.length < 24 ||
        fourcc(blob, 0) != "RIFF" || fourcc(blob, 8) != "AVI ") return None
      try {
        var width, height = -1
        var scale, rate = 0L
        // streams are numbered by strh order in hdrl; frame chunks carry
        // the stream number as a 2-digit prefix ("00dc"). Pin the FIRST
        // vids stream and collect only ITS chunks — a multi-stream AVI
        // (second video, subtitle data chunks) must not merge foreign
        // frames into the clip or inflate nFrames/duration.
        var strhSeen = 0
        var vidPrefix: String = null
        val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        // depth cap: spec-shaped AVIs nest ≤ ~4 LIST levels (RIFF →
        // hdrl → strl; movi → rec ), but the walker recurses per LIST
        // header, and a corrupt/adversarial blob of back-to-back 12-byte
        // LIST headers (~80k levels per MB) would StackOverflowError —
        // an Error, which ESCAPES the `case _: Exception` quarantine
        // below and fails the task. Past the cap the blob is declared
        // malformed (IllegalArgumentException → None), keeping the
        // "undecodable bytes become NULL, never exceptions" contract
        // for dirty 100 TB corpora.
        val maxDepth = 16
        def walk(from: Int, to: Int, ctx: String, depth: Int): Unit = {
          if (depth > maxDepth)
            throw new IllegalArgumentException("LIST nesting too deep")
          var pos = from
          while (pos + 8 <= to) {
            val id = fourcc(blob, pos)
            val size = u32(blob, pos + 4)
            val end = pos + 8 + size
            if (end > to) throw new IllegalArgumentException("truncated chunk")
            if (id == "LIST")
              walk(pos + 12, end.toInt, fourcc(blob, pos + 8), depth + 1)
            else if (id == "avih" && size >= 40) {
              width = u32(blob, pos + 8 + 32).toInt
              height = u32(blob, pos + 8 + 36).toInt
            } else if (id == "strh") {
              // stream numbering is POSITIONAL over all strh chunks —
              // count even truncated/foreign ones, or every stream
              // after a nonstandard header gets the wrong prefix
              if (size >= 36 && fourcc(blob, pos + 8) == "vids" &&
                vidPrefix == null) {
                vidPrefix = f"$strhSeen%02d"
                scale = u32(blob, pos + 8 + 20); rate = u32(blob, pos + 8 + 24)
              }
              strhSeen += 1
            } else if ((ctx == "movi" || ctx == "rec ") && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")) &&
              vidPrefix != null && id.startsWith(vidPrefix))
              frames += ((pos + 8, size.toInt)) // in-blob: end ≤ to checked above
            pos = (end + (size & 1)).toInt // word alignment
          }
        }
        walk(12, blob.length, "AVI ", 0)
        if (width < 0 || scale <= 0 || rate <= 0 || frames.isEmpty) None
        else {
          val fps = (rate / scale).toInt
          val n = frames.length
          Some((VideoMeta(width, height, n, fps, n * 1000L * scale / rate,
            "mpng"), frames.toArray))
        }
      } catch { case _: Exception => None }
    }

    def decodeMeta(blob: Array[Byte]): VideoMeta =
      parse(blob).map(_._1).orNull

    private def slice(blob: Array[Byte], r: (Int, Int)): Array[Byte] =
      java.util.Arrays.copyOfRange(blob, r._1, r._1 + r._2)

    /** Frame payloads (PNG bytes), container-level only — no pixel
      * decode. Null for non-AVI bytes. The one API that materializes
      * every frame at once — by definition of its return type. */
    def frames(blob: Array[Byte]): Array[Array[Byte]] =
      parse(blob).map(_._2.map(slice(blob, _))).orNull

    /** Frame 0's payload alone — the poster-frame path: a thumbnail /
      * keyframe-dedup scan pays ONE frame slice per clip, not a
      * 64-frame decode (at corpus scale that is the whole cost model
      * of poster dedup). Quarantine contract matches the family: a
      * clip whose RANGES don't resolve (truncated movi) is null as a
      * whole, even if frame 0's own bytes survive — partially-readable
      * clips quarantine whole, like corrupt bytes. */
    def firstFrame(blob: Array[Byte]): Array[Byte] =
      parse(blob).flatMap(_._2.headOption).map(slice(blob, _)).orNull

    /** Per-frame mean of pixel channel 0 (exact for solid fills), via
      * the same ImageIO decode as [[ImageCodec]]. Null if the container
      * or ANY frame fails to decode — a partially-readable video
      * quarantines whole, like corrupt bytes. Streaming per-frame
      * cursor (see [[Mp4Codec.frameMeans]]): each frame decodes
      * zero-copy from its blob range and drops before the next. */
    def frameMeans(blob: Array[Byte]): Array[Double] =
      parse(blob).flatMap { case (_, rs) =>
        val means = new Array[Double](rs.length)
        var i = 0
        var ok = true
        while (ok && i < rs.length) {
          val m = ImageCodec.channelMeansAt(blob, rs(i)._1, rs(i)._2)
          if (m == null) ok = false
          else { means(i) = m(0); i += 1 }
        }
        if (ok) Some(means) else None
      }.orNull

    /** Scene-cut indices: frames i ≥ 1 where the mean-luma jump from
      * frame i-1 exceeds `threshold` — the standard intensity-delta
      * shot-boundary heuristic, exact on solid-fill fixtures. */
    def sceneCuts(blob: Array[Byte], threshold: Double): Array[Int] =
      Option(frameMeans(blob)).map { m =>
        (1 until m.length).filter(i => math.abs(m(i) - m(i - 1)) > threshold).toArray
      }.orNull

    /** Deterministic keyframe decimation: keep every `stride`-th frame
      * and re-encode the container (fps unchanged — the sampled clip is
      * shorter, exactly ceil(n/stride) frames). The video analogue of
      * audio's decimation downsample. */
    def decimate(blob: Array[Byte], stride: Int): Array[Byte] = {
      // caller-bug guard (see AudioCodec.downsample): stride 0 would
      // throw ArithmeticException per row instead of failing at build
      require(stride >= 1, s"stride must be >= 1, got $stride")
      parse(blob).map { case (m, rs) =>
        // copies only the KEPT frames (parse resolves ranges, not bytes)
        encodeAvi((0 until rs.length by stride).map(i => slice(blob, rs(i))),
          m.width, m.height, m.fps)
      }.orNull
    }

    /** Solid-fill fixture: `nFrames` gray frames at `fps`; frames
      * before `cutIdx` fill `vA`, from `cutIdx` on fill `vB` (cutIdx<0
      * = no cut). Every statistic is exactly computable in the SQL
      * oracle from the parameters. */
    def encodeSolidAvi(nFrames: Int, w: Int, h: Int, fps: Int,
        cutIdx: Int, vA: Int, vB: Int): Array[Byte] = {
      // a solid clip holds at most TWO distinct frames; encode each
      // fill once and reuse the bytes (PNG encode is deterministic, so
      // the container is byte-identical to the per-frame-encode form —
      // but the fixture generator stops paying 64 ImageIO.write calls
      // per row inside measured gate projections)
      val pngA = ImageCodec.encodePng(w, h, vA, vA, vA)
      lazy val pngB = ImageCodec.encodePng(w, h, vB, vB, vB)
      encodeAvi((0 until nFrames).map { i =>
        if (cutIdx >= 0 && i >= cutIdx) pngB else pngA
      }, w, h, fps)
    }

    /** Solid AVI with ONE frame payload replaced by non-PNG garbage —
      * the frame-depth quarantine probe: the container walks fine
      * (decodeMeta reports geometry/fps/frame count from the intact
      * headers and chunk layout), but [[frameMeans]] hits the
      * undecodable payload and quarantines the whole clip with NULL.
      * Models a clip whose interior frames are corrupt past the
      * container — the depth a stage-attributed quarantine report must
      * distinguish from a broken container walk. */
    def encodeBadFrameAvi(nFrames: Int, w: Int, h: Int, fps: Int,
        v: Int, badIdx: Int): Array[Byte] = {
      require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
      val png = ImageCodec.encodePng(w, h, v, v, v)
      // deterministic garbage that no ImageIO reader claims (and that
      // is NOT a valid PNG prefix, so the cached-reader path also
      // rejects it cleanly)
      val bad = Array.tabulate(24)(i => ((i * 41 + 7) & 0xff).toByte)
      encodeAvi((0 until nFrames).map(i =>
        if (i == ((badIdx % nFrames + nFrames) % nFrames)) bad else png),
        w, h, fps)
    }

    /** Pattern AVI fixture encoder (the temporal analogue of
      * [[ImageCodec]]'s pattern PNG): 64 solid gray frames, frame i
      * filled `hi` when bit i of `pattern` is set, else `lo` — so
      * [[frameMeans]] recovers the pattern exactly and a temporal
      * fingerprint (frame mean vs clip mean) is SQL-predictable. */
    def encodePatternAvi(pattern: Long, w: Int, h: Int, fps: Int,
        hi: Int, lo: Int): Array[Byte] = {
      // two distinct fills → two PNG encodes, not 64 (see
      // [[encodeSolidAvi]]; byte-identical output, 32× less
      // fixture-encode work per row in the q252 projection)
      val pngHi = ImageCodec.encodePng(w, h, hi, hi, hi)
      val pngLo = ImageCodec.encodePng(w, h, lo, lo, lo)
      encodeAvi((0 until 64).map { i =>
        if (((pattern >>> i) & 1L) != 0L) pngHi else pngLo
      }, w, h, fps)
    }

    // ---- Column wrappers (Scala UDFs over the byte functions) ----------

    import org.apache.spark.sql.functions.udf

    val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
      .map(m => (m.width, m.height, m.nFrames, m.fps, m.durationMs, m.codec)))
    val frameMeansUdf = udf((b: Array[Byte]) => Option(frameMeans(b)))
    def sceneCutsUdf(threshold: Double) =
      udf((b: Array[Byte]) => Option(sceneCuts(b, threshold)))
    def decimateUdf(stride: Int) = {
      require(stride >= 1, s"stride must be >= 1, got $stride") // at build
      udf((b: Array[Byte]) => Option(decimate(b, stride)))
    }
    val encodeSolidAviUdf =
      udf((nf: Int, w: Int, h: Int, fps: Int, cut: Int, vA: Int, vB: Int) =>
        encodeSolidAvi(nf, w, h, fps, cut, vA, vB))
    val encodeBadFrameAviUdf =
      udf((nf: Int, w: Int, h: Int, fps: Int, v: Int, badIdx: Int) =>
        encodeBadFrameAvi(nf, w, h, fps, v, badIdx))
    val encodePatternAviUdf =
      udf((p: Long, w: Int, h: Int, fps: Int) =>
        encodePatternAvi(p, w, h, fps, 200, 40))
  }

  /** 64-bit perceptual hash from a 64-slot means array: bit i set iff
    * slot i's mean exceeds the whole-array mean — aHash's comparator
    * applied to any modality's per-slot means (audio window energies,
    * video frame intensities). Adds `mu` (the mean of means) and `fp`
    * (the hash) columns; computed entirely in Column space, and exact
    * on the pattern fixtures: slot means are integers and the /64 is a
    * power-of-two division, so the hash equals the encoded pattern
    * whenever 0 < popcount < 64.
    *
    * A NULL means array (a quarantined decode) yields a NULL `fp`, not
    * 0: `element_at(NULL, i) > mu` is NULL and `IF(NULL, a, b)` takes
    * the else branch, so without the guard every corrupt row would
    * collapse to fp = 0 and hamming-pair with every other corrupt row
    * (and with genuine all-zero fingerprints) at distance 0. NULL fp
    * rows drop out of the downstream equi-join naturally. */
  def meansHash(df: DataFrame, meansCol: String = "means"): DataFrame = df
    .withColumn("mu",
      expr(s"aggregate($meansCol, 0D, (a, x) -> a + x) / 64D"))
    .withColumn("fp",
      expr(s"""CASE WHEN $meansCol IS NULL THEN CAST(NULL AS BIGINT)
               ELSE aggregate(sequence(0, 63), 0L, (acc, i) ->
                 acc | IF(element_at($meansCol, i + 1) > mu,
                          shiftleft(1L, i), 0L)) END"""))

  /** Deterministic byte-level stand-ins for generic opaque media
    * bytes — kept for the modality-agnostic plumbing gates (q130/q131:
    * schema, partitioning, batch shape). The REAL codecs above
    * ([[ImageCodec]], [[AudioCodec]], [[VideoCodec]]) replace these for
    * image/audio/video; a hardware H.264 decoder would plug in via
    * JNI/javacv without touching the dataflow. */
  object FakeCodec {
    /** "Decode" = identity passthrough tagged with a decode marker. */
    def decode(blob: Column): Column = blob

    /** "Resize" to byte budget: deterministic truncation (byte-level
      * stand-in for a real transcode). */
    def resizeBytes(blob: Column, maxBytes: Int): Column =
      substring(blob, 1, maxBytes)

    /** Feature vector: `dims` deterministic hash-derived doubles in [0,1)
      * per blob — the shape (fixed-length Array[Double] per row) real
      * embedding extraction produces. A 56-bit polynomial hash of the
      * bytes with a per-dim affine mix: pure codegen'd column exprs, and
      * exactly replayable in plain SQL (list_reduce) so the gate query
      * has a DuckDB oracle. */
    def features(blob: Column, dims: Int = 8): Column = {
      val mod = 72057594037927936L // 2^56: products stay inside signed 64-bit
      val rh = aggregate(
        split(blob.cast("string"), ""), lit(0L),
        (acc, c) => pmod(acc * 31 + ascii(c), lit(mod)))
      array((0 until dims).map(i =>
        (pmod(rh * 31 + lit(i), lit(mod)) % 1000000L).cast("double") / 1000000.0): _*)
    }
  }

  /** Deterministic frame sampling: split a blob into `frameSize`-byte
    * frames, keep every `stride`-th — the video keyframe-sample shape
    * (one row in, N frame rows out, no shuffle). */
  def sampleFrames(df: DataFrame, blobCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    // caller-bug guards: stride 0 makes `i % stride` NULL in SQL, which
    // the filter silently drops — every row would emit ZERO frames with
    // no error at all (worse than a crash); frameSize 0 divides by zero
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val nFrames = ceil(length(col(blobCol)).cast("double") / frameSize).cast("int")
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0)))
      .withColumn("frame",
        expr(s"substring($blobCol, frame_idx * $frameSize + 1, $frameSize)"))
  }

  /** Full media pipeline stage: blob → (decoded) → resized → features.
    * Pure column expressions: runs inside the scan projection. */
  def extractFeatures(df: DataFrame, blobCol: String,
      maxBytes: Int = 1 << 20, dims: Int = 8): DataFrame =
    df.withColumn("media_resized", FakeCodec.resizeBytes(col(blobCol), maxBytes))
      .withColumn("media_features", FakeCodec.features(col("media_resized"), dims))
}
