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
  * all run executor-side with no external library. AUDIO/VIDEO codecs do
  * NOT ship in the JDK; for those modalities [[FakeCodec]] remains the
  * deterministic byte-level stand-in — swapping in a real decoder (JNI /
  * javacv) changes only the byte→byte function, not the dataflow.
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

    /** Decoded metadata: (width, height, channels, format) or null for
      * bytes no installed reader understands (callers filter/quarantine
      * on NULL — corrupt blobs are data, not exceptions, at 100 TB). */
    final case class ImageMeta(width: Int, height: Int, channels: Int,
        format: String)

    private def readImage(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (blob == null || blob.isEmpty) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob)))
      catch { case _: Exception => None }

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

    def decodeMeta(blob: Array[Byte]): ImageMeta =
      readImage(blob).map { img =>
        ImageMeta(img.getWidth, img.getHeight,
          img.getRaster.getNumBands, formatOf(blob).getOrElse("unknown"))
      }.orNull

    /** Per-channel pixel means as doubles (integer sums divided once —
      * exact for solid fills, deterministic always). Null for
      * undecodable bytes. */
    def channelMeans(blob: Array[Byte]): Array[Double] =
      readImage(blob).map { img =>
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
      }.orNull

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
    def downscale(blob: Array[Byte], maxDim: Int): Array[Byte] =
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
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }.orNull

    /** Solid-fill PNG encoder — the deterministic fixture generator for
      * specs/gates (solid fills make every pixel statistic exactly
      * computable in the SQL oracle). */
    def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, r)
          raster.setSample(x, y, 1, g)
          raster.setSample(x, y, 2, b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** JPEG encoder (default quality) — exercises the lossy decode path
      * in specs; pixel stats are approximate there by nature. */
    def encodeJpeg(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, r)
          raster.setSample(x, y, 1, g)
          raster.setSample(x, y, 2, b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    // ---- Column wrappers (Scala UDFs over the byte functions) ----------

    import org.apache.spark.sql.functions.udf

    val decodeMetaUdf = udf((b: Array[Byte]) => Option(decodeMeta(b))
      .map(m => (m.width, m.height, m.channels, m.format)))
    val channelMeansUdf = udf((b: Array[Byte]) => Option(channelMeans(b)))
    def downscaleUdf(maxDim: Int) =
      udf((b: Array[Byte]) => Option(downscale(b, maxDim)))
    val encodePngUdf =
      udf((w: Int, h: Int, r: Int, g: Int, b: Int) => encodePng(w, h, r, g, b))
  }

  /** Deterministic byte-level stand-ins for the modalities whose codecs
    * do NOT ship in the JDK (audio/video). Real implementations plug in
    * here (e.g. via JNI/javacv) without touching the dataflow; images
    * use the real [[ImageCodec]] above. */
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
