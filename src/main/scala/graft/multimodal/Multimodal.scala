package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel
  * processing, deterministic chunking — is real and tested; the actual
  * codec work is STUBBED behind `FakeCodec` (this environment ships no
  * image/audio libraries). Swapping in a real decoder changes only the
  * byte→byte functions, not the dataflow: each stage stays a narrow
  * per-row transformation that never shuffles, which is what makes this
  * viable over 100 TB of media — the only shuffles in a media pipeline
  * should be the caller's joins/groupBys, never the decode itself.
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

  /** STUB codec: deterministic byte-level stand-ins for decode/resize.
    * Real implementations plug in here (e.g. via JNI/javacv) without
    * touching the dataflow. */
  object FakeCodec {
    /** "Decode" = identity passthrough tagged with a decode marker. */
    def decode(blob: Column): Column = blob

    /** "Resize" to byte budget: truncate deterministically (`???`-grade
      * stand-in for pixel resampling). */
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
