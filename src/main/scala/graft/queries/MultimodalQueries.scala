package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.services.QueryReplay

/** Multimodal-column plumbing + replay harness coverage. */
object MultimodalQueries extends QueryBatch {

  /** The id spine every media-codec gate encodes its fixture from.
    * Repartitioned before the per-row codec UDFs: the driver testdata is
    * ONE parquet split, and Spark will not subdivide a small file, so
    * without this the whole encode→decode chain would inherit a single
    * partition and run on one core — the q252 pattern clip (64 PNG
    * frames per row) turns that into minutes. A real media corpus
    * arrives as many splits and gets partition-parallel decode for
    * free; the trivial id shuffle (a few KB) models exactly that shape.
    *
    * The partition count is EXPLICIT for a reason: the spine is a few
    * KB, so a plain repartition(col) — a coalescable shuffle — gets
    * collapsed back to ONE partition by AQE's size-based coalescing
    * (post-shuffle bytes say nothing about the per-row codec cost that
    * follows). repartition(n, col) is a by-num shuffle, which AQE
    * leaves alone. Measured: without the explicit count, q252 ran its
    * 64-frame encode on one core for minutes.
    */
  private def mediaRows(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "documents").select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))

  /** Binary media pipeline: text→blob, typed metadata, deterministic
    * frame sampling, per-frame hash. The codec is stubbed (FakeCodec) but
    * the dataflow — binary column, metadata struct, 1→N frame explode with
    * no shuffle — is the real shape. */
  private val q130 = GQ(
    "q130_multimodal_frames",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .withColumn("blob", col("text").cast("binary"))
      val withMeta = Multimodal.withMediaMeta(docs, "blob", "video", "rawtext")
      Multimodal.sampleFrames(withMeta, "blob", frameSize = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          sha2(col("frame"), 256).as("frame_sha"),
          col("media_meta.size_bytes").as("size_bytes"))
        .orderBy("doc_id", "frame_idx")
    },
    Some("""SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
            sha256(substr(text, CAST(i AS INTEGER) * 64 + 1, 64)) AS frame_sha,
            CAST(length(text) AS BIGINT) AS size_bytes
            FROM documents, UNNEST(range(CAST(ceil(length(text) / 64.0) AS INTEGER))) t(i)
            WHERE i % 2 = 0
            ORDER BY doc_id, frame_idx""")
  )

  /** Media feature extraction: fixed-length deterministic feature vector
    * per blob (stub embedding). Output is exploded to scalar
    * (doc_id, dim, feature) rows — the driver's checker can't sort/hash
    * raw array cells — and the polynomial-hash features are replayed
    * exactly in the DuckDB oracle via list_reduce. */
  private val q131 = GQ(
    "q131_multimodal_features",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .withColumn("blob", col("text").cast("binary"))
      Multimodal.extractFeatures(docs, "blob", maxBytes = 128, dims = 8)
        .select(col("doc_id"), posexplode(col("media_features")).as(Seq("dim", "feature")))
        .orderBy("doc_id", "dim")
    },
    Some("""SELECT doc_id, CAST(dim AS INTEGER) AS dim,
            CAST((rh * 31 + dim) % 72057594037927936 % 1000000 AS DOUBLE)
              / 1000000.0 AS feature
            FROM (SELECT doc_id,
                    list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        [ascii(c) FOR c IN string_split(substr(text, 1, 128), '')]),
                      (acc, c) -> (acc * 31 + c) % 72057594037927936) AS rh
                  FROM documents),
                 UNNEST(range(8)) t(dim)
            ORDER BY doc_id, dim""")
  )

  /** REAL image decode (javax.imageio, in the JDK): per-doc solid-fill
    * PNGs are encoded executor-side, then decoded — width/height/
    * channels/format metadata, exact per-channel pixel means, and a
    * deterministic integer box-filter downscale whose output PNG is
    * decoded again. Solid fills make every statistic exactly computable
    * from doc_id alone, so the whole decode→stats→resize→re-decode
    * pipeline has a plain-SQL oracle. Everything is a narrow per-row
    * projection: encode/decode never shuffle. */
  private val q246 = GQ(
    "q246_image_decode",
    (s, dir) => {
      import Multimodal.ImageCodec
      val docs = mediaRows(s, dir)
        .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(25))).cast("int"))
        .withColumn("h", (lit(8) + pmod(col("doc_id") * 7, lit(25))).cast("int"))
        .withColumn("r", pmod(col("doc_id"), lit(256)).cast("int"))
        .withColumn("g", pmod(col("doc_id") * 3, lit(256)).cast("int"))
        .withColumn("b", pmod(col("doc_id") * 5, lit(256)).cast("int"))
      docs
        .withColumn("blob", ImageCodec.encodePngUdf(
          col("w"), col("h"), col("r"), col("g"), col("b")))
        .withColumn("meta", ImageCodec.decodeMetaUdf(col("blob")))
        .withColumn("means", ImageCodec.channelMeansUdf(col("blob")))
        .withColumn("small", ImageCodec.downscaleUdf(16)(col("blob")))
        .withColumn("smeta", ImageCodec.decodeMetaUdf(col("small")))
        .withColumn("smeans", ImageCodec.channelMeansUdf(col("small")))
        .select(
          col("doc_id"),
          col("meta._1").as("width"), col("meta._2").as("height"),
          col("meta._3").as("channels"), col("meta._4").as("format"),
          col("means")(0).as("mean_r"), col("means")(1).as("mean_g"),
          col("means")(2).as("mean_b"),
          col("smeta._1").as("ds_width"), col("smeta._2").as("ds_height"),
          col("smeans")(0).as("ds_mean_r"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels, 'png' AS format,
              CAST(r AS DOUBLE) AS mean_r, CAST(g AS DOUBLE) AS mean_g,
              CAST(b AS DOUBLE) AS mean_b,
              CAST(CASE WHEN m <= 16 THEN w
                   ELSE greatest(1, CAST(round(w * 16.0 / m) AS INTEGER)) END
                AS INTEGER) AS ds_width,
              CAST(CASE WHEN m <= 16 THEN h
                   ELSE greatest(1, CAST(round(h * 16.0 / m) AS INTEGER)) END
                AS INTEGER) AS ds_height,
              CAST(r AS DOUBLE) AS ds_mean_r
            FROM (SELECT doc_id,
                    8 + doc_id % 25 AS w,
                    8 + (doc_id * 7) % 25 AS h,
                    doc_id % 256 AS r, (doc_id * 3) % 256 AS g,
                    (doc_id * 5) % 256 AS b,
                    greatest(8 + doc_id % 25, 8 + (doc_id * 7) % 25) AS m
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** REAL audio decode (javax.sound.sampled, in the JDK): per-doc
    * constant-fill PCM16 clips — two thirds WAV (little-endian), one
    * third AIFF (big-endian, the other container the JDK SPI family
    * decodes) — are encoded executor-side, then decoded —
    * sample-rate/channels/bits/frames/duration metadata, exact
    * per-channel sample means, clip-scan peak, and an integer-decimation
    * downsample whose output WAV is decoded again. Constant fills make
    * every statistic exactly computable from doc_id alone, so the whole
    * encode→decode→stats→downsample→re-decode pipeline has a plain-SQL
    * oracle. Everything is a narrow per-row projection: no shuffle. */
  private val q247 = GQ(
    "q247_audio_decode",
    (s, dir) => {
      import Multimodal.AudioCodec
      val docs = mediaRows(s, dir)
        .withColumn("frames", (lit(50) + pmod(col("doc_id"), lit(200))).cast("int"))
        .withColumn("ch", (lit(1) + pmod(col("doc_id"), lit(2))).cast("int"))
        .withColumn("v0", (pmod(col("doc_id") * 7, lit(60001)) - 30000).cast("int"))
        .withColumn("v1", (pmod(col("doc_id") * 11, lit(60001)) - 30000).cast("int"))
      docs
        // a third of the corpus ships as AIFF (big-endian PCM, the
        // same JDK SPI family) — the oracle is container-blind
        // because readPcm16 is byte-order-aware, so WAV and AIFF
        // decode to identical values from the same parameters
        .withColumn("blob",
          when(pmod(col("doc_id"), lit(3)) === 1, AudioCodec.encodeAiffUdf(
            col("frames"), lit(8000), col("v0"), col("v1"), col("ch")))
          .otherwise(AudioCodec.encodeWavUdf(
            col("frames"), lit(8000), col("v0"), col("v1"), col("ch"))))
        .withColumn("meta", AudioCodec.decodeMetaUdf(col("blob")))
        .withColumn("means", AudioCodec.channelMeansUdf(col("blob")))
        .withColumn("pk", AudioCodec.peakUdf(col("blob")))
        .withColumn("small", AudioCodec.downsampleUdf(4)(col("blob")))
        .withColumn("smeta", AudioCodec.decodeMetaUdf(col("small")))
        .withColumn("smeans", AudioCodec.channelMeansUdf(col("small")))
        .select(
          col("doc_id"),
          col("meta._1").as("sample_rate"), col("meta._2").as("channels"),
          col("meta._3").as("bits"), col("meta._4").as("n_frames"),
          col("meta._5").as("duration_ms"), col("meta._6").as("format"),
          col("means")(0).as("mean_c0"), col("pk").as("peak"),
          col("smeta._1").as("ds_rate"), col("smeta._4").as("ds_frames"),
          col("smeans")(0).as("ds_mean_c0"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(8000 AS INTEGER) AS sample_rate,
              CAST(ch AS INTEGER) AS channels,
              CAST(16 AS INTEGER) AS bits,
              CAST(frames AS BIGINT) AS n_frames,
              CAST(frames * 1000 // 8000 AS BIGINT) AS duration_ms,
              'pcm_signed' AS format,
              CAST(v0 AS DOUBLE) AS mean_c0,
              CAST(CASE WHEN ch = 2 THEN greatest(abs(v0), abs(v1))
                   ELSE abs(v0) END AS INTEGER) AS peak,
              CAST(2000 AS INTEGER) AS ds_rate,
              CAST(ceil(frames / 4.0) AS BIGINT) AS ds_frames,
              CAST(v0 AS DOUBLE) AS ds_mean_c0
            FROM (SELECT doc_id,
                    50 + doc_id % 200 AS frames,
                    1 + doc_id % 2 AS ch,
                    (doc_id * 7) % 60001 - 30000 AS v0,
                    (doc_id * 11) % 60001 - 30000 AS v1
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** Perceptual image near-dup: every doc gets an 8×8-cell pattern PNG
    * (repetition-coded group pattern, ~1 doc in 3 with one cell flipped
    * — a "re-encoded variant"), then aHash fingerprints each image and
    * the pigeonhole-banded hamming join finds all pairs within radius 2.
    * Group patterns differ by ≥ 8 bits by construction (byte-repetition
    * code), so exactly the same-group pairs — and their exact hamming
    * distances — are SQL-predictable without bit arithmetic in the
    * oracle. The scalable shape: per-row UDF fingerprint in the scan
    * projection, then a bucketed join keyed on (chunk, value) — no
    * quadratic candidate stage at any corpus size. */
  private val q248 = GQ(
    "q248_image_near_dup",
    (s, dir) => {
      import Multimodal.ImageCodec
      val d = mediaRows(s, dir)
        .withColumn("g", pmod(col("doc_id"), lit(200L)))
        .withColumn("fb", when(pmod(col("doc_id"), lit(3)) === 0,
          expr("(doc_id div 200) % 64")).otherwise(lit(-1L)))
      val pBase = (0 until 8).map { j =>
        when(shiftright(col("g"), j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val p = when(col("fb") >= 0,
        pBase.bitwiseXOR(expr("shiftleft(1L, cast(fb as int))")))
        .otherwise(pBase)
      // materialize (doc_id, fp) ONCE before the pair join: the join
      // references its input twice (probe + broadcast build), and
      // without a barrier each side re-runs the whole encode→decode
      // chain — and AQE's local shuffle read around the broadcast join
      // collapses the probe side back to per-mapper partitions (one,
      // for single-split testdata). Fingerprint-once → join-from-
      // signatures is also the honest 100 TB shape.
      val fps = d
        .withColumn("blob", ImageCodec.encodePatternPngUdf(p, lit(4)))
        .withColumn("fp", ImageCodec.aHashUdf(col("blob")))
        .select("doc_id", "fp").localCheckpoint()
      graft.text.DedupOps.fingerprintPairs(fps, "doc_id", "fp", maxHamming = 2)
        .select(col("d1"), col("d2"), col("hamming").cast("int").as("hamming"))
        .orderBy("d1", "d2")
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 200 AS g,
                CASE WHEN doc_id % 3 = 0 THEN (doc_id // 200) % 64
                     ELSE -1 END AS fb
              FROM documents)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(CASE WHEN a.fb = b.fb THEN 0
                        WHEN a.fb = -1 OR b.fb = -1 THEN 1
                        ELSE 2 END AS INTEGER) AS hamming
            FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
            ORDER BY d1, d2""")
  )

  /** REAL video container decode (RIFF/AVI + Motion-PNG, pure JVM):
    * per-doc solid-fill clips — half with one mid-clip fill jump (a
    * "scene change") — are encoded executor-side, then the container is
    * re-parsed for geometry/fps/frame-count/duration metadata,
    * per-frame means drive intensity-delta scene-cut detection, and a
    * keyframe decimation (every 2nd frame) is re-encoded and re-parsed.
    * Solid fills + scale=1 timing make every statistic exactly
    * computable from doc_id alone, so the whole
    * encode→parse→stats→cut-detect→decimate→re-parse pipeline has a
    * plain-SQL oracle. Narrow per-row projections throughout: the
    * decode never shuffles. */
  private val q249 = GQ(
    "q249_video_decode",
    (s, dir) => {
      import Multimodal.VideoCodec
      val d = mediaRows(s, dir)
        .withColumn("nf", (lit(3) + pmod(col("doc_id"), lit(6))).cast("int"))
        .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(9))).cast("int"))
        .withColumn("h", (lit(8) + pmod(col("doc_id") * 3, lit(9))).cast("int"))
        .withColumn("fps", (lit(5) + pmod(col("doc_id"), lit(10))).cast("int"))
        .withColumn("va", pmod(col("doc_id"), lit(200)).cast("int"))
        .withColumn("cut", when(pmod(col("doc_id"), lit(2)) === 0,
          (lit(1) + pmod(col("doc_id"), (col("nf") - 1).cast("long"))).cast("int"))
          .otherwise(lit(-1)))
      d.withColumn("blob", VideoCodec.encodeSolidAviUdf(
          col("nf"), col("w"), col("h"), col("fps"), col("cut"),
          col("va"), col("va") + 40))
        .withColumn("meta", VideoCodec.decodeMetaUdf(col("blob")))
        .withColumn("means", VideoCodec.frameMeansUdf(col("blob")))
        // intensity-delta cut detection Column-side over the means the
        // row already decoded — NOT sceneCutsUdf(blob), which would
        // re-parse the container and pixel-decode every frame a second
        // time (that UDF is the one-shot API for callers without a
        // means column). NULL means (quarantined clip) must stay NULL,
        // not read as "no cuts detected".
        .withColumn("cuts", expr(
          """CASE WHEN means IS NULL THEN CAST(NULL AS array<int>)
                  WHEN size(means) >= 2 THEN
               filter(sequence(1, size(means) - 1), i ->
                 abs(element_at(means, i + 1) - element_at(means, i)) > 20.0D)
             ELSE cast(array() AS array<int>) END"""))
        .withColumn("small", VideoCodec.decimateUdf(2)(col("blob")))
        .withColumn("smeta", VideoCodec.decodeMetaUdf(col("small")))
        .select(
          col("doc_id"),
          col("meta._1").as("width"), col("meta._2").as("height"),
          col("meta._3").as("n_frames"), col("meta._4").as("fps"),
          col("meta._5").as("duration_ms"), col("meta._6").as("codec"),
          get(col("means"), lit(0)).as("mean_first"),
          get(col("means"), col("meta._3") - 1).as("mean_last"),
          size(col("cuts")).as("n_cuts"),
          coalesce(get(col("cuts"), lit(0)), lit(-1)).as("cut_idx"),
          col("smeta._3").as("ds_frames"),
          col("smeta._5").as("ds_duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
              CAST(nf AS INTEGER) AS n_frames, CAST(fps AS INTEGER) AS fps,
              CAST(nf * 1000 // fps AS BIGINT) AS duration_ms,
              'mpng' AS codec,
              CAST(va AS DOUBLE) AS mean_first,
              CAST(CASE WHEN cut >= 0 THEN va + 40 ELSE va END AS DOUBLE)
                AS mean_last,
              CAST(CASE WHEN cut >= 0 THEN 1 ELSE 0 END AS INTEGER) AS n_cuts,
              CAST(cut AS INTEGER) AS cut_idx,
              CAST(ceil(nf / 2.0) AS INTEGER) AS ds_frames,
              CAST(CAST(ceil(nf / 2.0) AS BIGINT) * 1000 // fps AS BIGINT)
                AS ds_duration_ms
            FROM (SELECT doc_id,
                    3 + doc_id % 6 AS nf,
                    8 + doc_id % 9 AS w,
                    8 + (doc_id * 3) % 9 AS h,
                    5 + doc_id % 10 AS fps,
                    doc_id % 200 AS va,
                    CASE WHEN doc_id % 2 = 0
                         THEN 1 + doc_id % (2 + doc_id % 6)
                         ELSE -1 END AS cut
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** Video keyframe sampling through the container: decimate to every
    * 2nd frame by re-encoding the AVI, then explode the sampled clip's
    * per-frame means to rows — the 1-row-in → N-frame-rows-out shape a
    * frame-level training pipeline consumes, with the container
    * transcode (not byte slicing) doing the sampling. Sampled frame i
    * is original frame 2i, so the oracle replays the fill schedule in
    * plain SQL. */
  private val q250 = GQ(
    "q250_video_frame_sample",
    (s, dir) => {
      import Multimodal.VideoCodec
      val d = mediaRows(s, dir)
        .withColumn("nf", (lit(4) + pmod(col("doc_id"), lit(5))).cast("int"))
        .withColumn("va", pmod(col("doc_id") * 3, lit(200)).cast("int"))
        .withColumn("cut", when(pmod(col("doc_id"), lit(2)) === 0,
          (lit(1) + pmod(col("doc_id"), (col("nf") - 1).cast("long"))).cast("int"))
          .otherwise(lit(-1)))
      d.withColumn("blob", VideoCodec.encodeSolidAviUdf(
          col("nf"), lit(8), lit(8), lit(10), col("cut"),
          col("va"), col("va") + 40))
        .withColumn("small", VideoCodec.decimateUdf(2)(col("blob")))
        .withColumn("means", VideoCodec.frameMeansUdf(col("small")))
        .select(col("doc_id"),
          posexplode(col("means")).as(Seq("frame_idx", "mean_c0")))
        .orderBy("doc_id", "frame_idx")
    },
    Some("""SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
              CAST(CASE WHEN cut >= 0 AND 2 * i >= cut
                   THEN va + 40 ELSE va END AS DOUBLE) AS mean_c0
            FROM (SELECT doc_id,
                    4 + doc_id % 5 AS nf,
                    (doc_id * 3) % 200 AS va,
                    CASE WHEN doc_id % 2 = 0
                         THEN 1 + doc_id % (3 + doc_id % 5)
                         ELSE -1 END AS cut
                  FROM documents),
                 UNNEST(range(CAST(ceil(nf / 2.0) AS INTEGER))) t(i)
            ORDER BY doc_id, frame_idx""")
  )

  /** [[Multimodal.meansHash]]: the Column-side 64-bit perceptual hash
    * over a 64-slot means array (the only UDF in the q251/q252
    * pipelines is the decode that produced the means). NULL-guarded —
    * a quarantined decode yields NULL fp and drops out of the pair
    * join; it must not collapse to fp = 0 and hamming-pair with every
    * other corrupt row. */
  private def meansHash(df: org.apache.spark.sql.DataFrame) =
    Multimodal.meansHash(df)

  /** Perceptual near-dup for AUDIO: every doc gets a 64-window pattern
    * WAV (repetition-coded group pattern; ~1 doc in 3 with one window's
    * amplitude flipped — a "re-mastered variant"), the REAL decoder
    * recovers per-window energy means, a 64-bit energy hash is computed
    * Column-side, and the same pigeonhole-banded hamming join the text
    * and image sides use finds all pairs within radius 2. Group
    * patterns differ by ≥ 8 bits (byte-repetition code), so exactly the
    * same-group pairs — and their exact hamming distances — are
    * SQL-predictable. Scalable shape: per-row decode UDF in the scan
    * projection, codegen'd hash, bucketed (chunk, value) join — no
    * quadratic candidate stage at any corpus size. */
  private val q251 = GQ(
    "q251_audio_near_dup",
    (s, dir) => {
      import Multimodal.AudioCodec
      val d = mediaRows(s, dir)
        .withColumn("g", pmod(col("doc_id"), lit(180L)))
        .withColumn("fb", when(pmod(col("doc_id"), lit(3)) === 1,
          expr("(doc_id div 180) % 64")).otherwise(lit(-1L)))
      val pBase = (0 until 8).map { j =>
        when(shiftright(col("g"), j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val p = when(col("fb") >= 0,
        pBase.bitwiseXOR(expr("shiftleft(1L, cast(fb as int))")))
        .otherwise(pBase)
      // materialized once pre-join — see q248's barrier note
      val fps = meansHash(d
        .withColumn("blob", AudioCodec.encodePatternWavUdf(25)(p))
        .withColumn("means", AudioCodec.windowMeansUdf(64)(col("blob"))))
        .select("doc_id", "fp").localCheckpoint()
      graft.text.DedupOps.fingerprintPairs(fps, "doc_id", "fp", maxHamming = 2)
        .select(col("d1"), col("d2"), col("hamming").cast("int").as("hamming"))
        .orderBy("d1", "d2")
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 180 AS g,
                CASE WHEN doc_id % 3 = 1 THEN (doc_id // 180) % 64
                     ELSE -1 END AS fb
              FROM documents)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(CASE WHEN a.fb = b.fb THEN 0
                        WHEN a.fb = -1 OR b.fb = -1 THEN 1
                        ELSE 2 END AS INTEGER) AS hamming
            FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
            ORDER BY d1, d2""")
  )

  /** Perceptual near-dup for VIDEO: every doc gets a 64-frame pattern
    * clip (repetition-coded fill schedule; ~1 doc in 4 with one frame's
    * fill flipped — a "re-encoded variant"), the container walker +
    * per-frame decode recover the mean-intensity sequence, and the same
    * Column-side 64-bit temporal hash + banded hamming join find all
    * pairs within radius 2 — completing the perceptual-dedup matrix
    * (text/simhash, image/aHash, audio/energy-hash, video/temporal
    * hash) over ONE shared pair-join operator. */
  private val q252 = GQ(
    "q252_video_near_dup",
    (s, dir) => {
      import Multimodal.VideoCodec
      val d = mediaRows(s, dir)
        .withColumn("g", pmod(col("doc_id"), lit(150L)))
        .withColumn("fb", when(pmod(col("doc_id"), lit(4)) === 0,
          expr("(doc_id div 150) % 64")).otherwise(lit(-1L)))
      val pBase = (0 until 8).map { j =>
        when(shiftright(col("g"), j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val p = when(col("fb") >= 0,
        pBase.bitwiseXOR(expr("shiftleft(1L, cast(fb as int))")))
        .otherwise(pBase)
      // materialized once pre-join — see q248's barrier note; for the
      // 64-frame clips the unbarriered recompute is minutes, not noise
      val fps = meansHash(d
        .withColumn("blob", VideoCodec.encodePatternAviUdf(p, lit(8), lit(8), lit(10)))
        .withColumn("means", VideoCodec.frameMeansUdf(col("blob"))))
        .select("doc_id", "fp").localCheckpoint()
      graft.text.DedupOps.fingerprintPairs(fps, "doc_id", "fp", maxHamming = 2)
        .select(col("d1"), col("d2"), col("hamming").cast("int").as("hamming"))
        .orderBy("d1", "d2")
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 150 AS g,
                CASE WHEN doc_id % 4 = 0 THEN (doc_id // 150) % 64
                     ELSE -1 END AS fb
              FROM documents)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(CASE WHEN a.fb = b.fb THEN 0
                        WHEN a.fb = -1 OR b.fb = -1 THEN 1
                        ELSE 2 END AS INTEGER) AS hamming
            FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
            ORDER BY d1, d2""")
  )

  /** Media quarantine-rate report: the FIRST scan a training pipeline
    * runs over a new media drop — per (modality, corruption) counts of
    * decodable vs quarantined blobs, derived entirely from the
    * metadata-depth decode (no pixel/sample work). The fixture mixes
    * all three modalities (doc_id % 3) and deterministically corrupts
    * ~1 doc in 7 by truncating the blob to 20 bytes (inside every
    * container's header), so the oracle predicts each row's quarantine
    * fate from doc_id arithmetic alone — the NULL-quarantine contract
    * the codecs promise, verified through the oracle gate rather than
    * only specs. One narrow projection + one 6-group aggregate: at
    * 100 TB this is a single scan, no shuffle beyond the tiny rollup. */
  private val q253 = GQ(
    "q253_media_quarantine",
    (s, dir) => {
      import Multimodal.{AudioCodec, ImageCodec, VideoCodec}
      val d = mediaRows(s, dir)
        .withColumn("modality", pmod(col("doc_id"), lit(3)).cast("int"))
        .withColumn("corrupted",
          (pmod(col("doc_id"), lit(7)) === 0).cast("int"))
      // CASE branches evaluate lazily per row: each row pays exactly
      // one modality's encode, mirroring a real mixed-media column
      val blob = when(col("modality") === 0,
          ImageCodec.encodePngUdf(lit(16), lit(16),
            pmod(col("doc_id"), lit(256)).cast("int"), lit(0), lit(0)))
        .when(col("modality") === 1,
          AudioCodec.encodeWavUdf(lit(64), lit(8000),
            pmod(col("doc_id"), lit(30000)).cast("int"), lit(0), lit(1)))
        .otherwise(VideoCodec.encodeSolidAviUdf(lit(3), lit(8), lit(8),
          lit(5), lit(-1), pmod(col("doc_id"), lit(200)).cast("int"), lit(0)))
      d.withColumn("blob0", blob)
        .withColumn("blob", when(col("corrupted") === 1,
          expr("substring(blob0, 1, 20)")).otherwise(col("blob0")))
        .withColumn("decoded",
          when(col("modality") === 0,
            ImageCodec.decodeMetaUdf(col("blob")).isNotNull)
          .when(col("modality") === 1,
            AudioCodec.decodeMetaUdf(col("blob")).isNotNull)
          .otherwise(VideoCodec.decodeMetaUdf(col("blob")).isNotNull))
        .groupBy("modality", "corrupted")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
          sum(when(!col("decoded"), 1L).otherwise(0L)).as("n_quarantined"))
        .orderBy("modality", "corrupted")
    },
    Some("""SELECT CAST(doc_id % 3 AS INTEGER) AS modality,
              CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INTEGER)
                AS corrupted,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END) AS BIGINT)
                AS n_decoded,
              CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_quarantined
            FROM documents
            GROUP BY 1, 2
            ORDER BY modality, corrupted""")
  )

  /** REAL MP4/ISO-BMFF container decode (pure JVM, public ISO/IEC
    * 14496-12 spec): per-doc solid-fill Motion-PNG clips are encoded
    * executor-side into full ftyp/moov/mdat files — multi-sample
    * chunks, real stsz/stsc/stco sample tables — then the box tree is
    * re-walked for geometry/timescale/sample-count/duration metadata,
    * the stsc→stco→stsz chunk walk resolves every sample's byte range,
    * per-sample means drive intensity-delta cut detection, and a
    * keyframe decimation re-encodes and re-parses the container. A
    * third of the rows ship FRAGMENTED (moof/trun + mvex/trex, the
    * DASH/HLS layout), exercising the fragment walk under the same
    * layout-blind oracle.
    * Deterministic fuzz rows pin the STAGE-ATTRIBUTED quarantine
    * contract: ~1 doc in 7 is cut inside the ftyp header (container
    * depth — every column NULL) and ~1 in 7 loses its mdat tail
    * (sample depth — the moov-first metadata still reads, the sample
    * ranges quarantine), so the oracle predicts each row's quarantine
    * stage from doc_id arithmetic alone. Narrow per-row projections
    * throughout: the decode never shuffles. */
  private val q254 = GQ(
    "q254_mp4_decode",
    (s, dir) => {
      import graft.multimodal.Mp4Codec
      val d = mediaRows(s, dir)
        .withColumn("nf", (lit(3) + pmod(col("doc_id"), lit(6))).cast("int"))
        .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(9))).cast("int"))
        .withColumn("h", (lit(8) + pmod(col("doc_id") * 3, lit(9))).cast("int"))
        .withColumn("fps", (lit(5) + pmod(col("doc_id"), lit(10))).cast("int"))
        .withColumn("va", pmod(col("doc_id"), lit(200)).cast("int"))
        .withColumn("cut", when(pmod(col("doc_id"), lit(2)) === 0,
          (lit(1) + pmod(col("doc_id"), (col("nf") - 1).cast("long"))).cast("int"))
          .otherwise(lit(-1)))
      // a third of the corpus ships as FRAGMENTED MP4 (moof/trun, the
      // DASH/HLS layout; empty stbl + mvex/trex defaults) — the oracle
      // is layout-blind because both encoders produce identical
      // metadata/means from the same parameters, so one prediction
      // covers both walker paths, including the fuzz rows (a cut mdat
      // tail quarantines at sample depth in either layout)
      d.withColumn("blob0",
          when(pmod(col("doc_id"), lit(3)) === 2,
            Mp4Codec.encodeSolidFragmentedMp4Udf(
              col("nf"), col("w"), col("h"), col("fps"), col("cut"),
              col("va"), col("va") + 40))
          .otherwise(Mp4Codec.encodeSolidMp4Udf(
            col("nf"), col("w"), col("h"), col("fps"), col("cut"),
            col("va"), col("va") + 40)))
        // two corruption depths, Column-side: header cut (inside ftyp)
        // vs payload cut (mdat tail) — the moov-first layout makes the
        // second readable at metadata depth by construction
        .withColumn("blob",
          when(pmod(col("doc_id"), lit(7)) === 0, expr("substring(blob0, 1, 20)"))
          .when(pmod(col("doc_id"), lit(7)) === 1,
            expr("substring(blob0, 1, length(blob0) - 5)"))
          .otherwise(col("blob0")))
        .withColumn("meta", Mp4Codec.decodeMetaUdf(col("blob")))
        .withColumn("means", Mp4Codec.frameMeansUdf(col("blob")))
        // Column-side cut detection over the means the row already
        // decoded (see q249); NULL means must stay NULL
        .withColumn("cuts", expr(
          """CASE WHEN means IS NULL THEN CAST(NULL AS array<int>)
                  WHEN size(means) >= 2 THEN
               filter(sequence(1, size(means) - 1), i ->
                 abs(element_at(means, i + 1) - element_at(means, i)) > 20.0D)
             ELSE cast(array() AS array<int>) END"""))
        .withColumn("small", Mp4Codec.decimateUdf(2)(col("blob")))
        .withColumn("smeta", Mp4Codec.decodeMetaUdf(col("small")))
        .select(
          col("doc_id"),
          col("meta._1").as("width"), col("meta._2").as("height"),
          col("meta._3").as("n_samples"), col("meta._4").as("timescale"),
          col("meta._5").as("duration_ms"), col("meta._6").as("codec"),
          get(col("means"), lit(0)).as("mean_first"),
          get(col("means"), col("meta._3") - 1).as("mean_last"),
          when(col("cuts").isNull, lit(null).cast("int"))
            .otherwise(size(col("cuts"))).as("n_cuts"),
          when(col("means").isNull, lit(null).cast("int"))
            .otherwise(coalesce(get(col("cuts"), lit(0)), lit(-1))).as("cut_idx"),
          col("smeta._3").as("ds_samples"),
          col("smeta._5").as("ds_duration_ms"),
          // the stage attribution a 100 TB first-scan reports: which
          // decode depth quarantined the row
          when(col("meta").isNull, lit("container"))
            .when(col("means").isNull, lit("sample"))
            .otherwise(lit("ok")).as("stage"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CASE WHEN kind = 'container' THEN NULL
                   ELSE CAST(w AS INTEGER) END AS width,
              CASE WHEN kind = 'container' THEN NULL
                   ELSE CAST(h AS INTEGER) END AS height,
              CASE WHEN kind = 'container' THEN NULL
                   ELSE CAST(nf AS INTEGER) END AS n_samples,
              CASE WHEN kind = 'container' THEN NULL
                   ELSE CAST(fps AS INTEGER) END AS timescale,
              CASE WHEN kind = 'container' THEN NULL
                   ELSE CAST(nf * 1000 // fps AS BIGINT) END AS duration_ms,
              CASE WHEN kind = 'container' THEN NULL ELSE 'mpng' END AS codec,
              CASE WHEN kind = 'ok' THEN CAST(va AS DOUBLE) END AS mean_first,
              CASE WHEN kind = 'ok' THEN
                CAST(CASE WHEN cut >= 0 THEN va + 40 ELSE va END AS DOUBLE)
                END AS mean_last,
              CASE WHEN kind = 'ok' THEN
                CAST(CASE WHEN cut >= 0 THEN 1 ELSE 0 END AS INTEGER)
                END AS n_cuts,
              CASE WHEN kind = 'ok' THEN CAST(cut AS INTEGER) END AS cut_idx,
              CASE WHEN kind = 'ok'
                   THEN CAST(ceil(nf / 2.0) AS INTEGER) END AS ds_samples,
              CASE WHEN kind = 'ok'
                   THEN CAST(CAST(ceil(nf / 2.0) AS BIGINT) * 1000 // fps AS BIGINT)
                END AS ds_duration_ms,
              kind AS stage
            FROM (SELECT doc_id,
                    3 + doc_id % 6 AS nf,
                    8 + doc_id % 9 AS w,
                    8 + (doc_id * 3) % 9 AS h,
                    5 + doc_id % 10 AS fps,
                    doc_id % 200 AS va,
                    CASE WHEN doc_id % 2 = 0
                         THEN 1 + doc_id % (2 + doc_id % 6)
                         ELSE -1 END AS cut,
                    CASE WHEN doc_id % 7 = 0 THEN 'container'
                         WHEN doc_id % 7 = 1 THEN 'sample'
                         ELSE 'ok' END AS kind
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** STAGE-ATTRIBUTED media quarantine report: q253 counts WHETHER a
    * blob quarantined; this gate reports WHERE — which decode stage
    * rejected it — across all four modalities (image/audio/AVI/MP4,
    * doc_id % 4). Two deterministic corruption depths per modality:
    * a 20-byte header cut (header/container stage: nothing decodes)
    * and a BELOW-header corruption that leaves metadata readable while
    * the sample-level stage quarantines — zeroed IDAT payload (image →
    * 'raster'), 8-bit non-PCM16 WAV (audio → 'pcm'), one garbage frame
    * payload in a walkable AVI (video → 'frame'), truncated mdat under
    * an intact moov (mp4 → 'sample'). The oracle predicts every row's
    * stage from doc_id arithmetic alone, so the per-stage NULL
    * contracts of all eight decode depths are oracle-gated, not just
    * spec-pinned. One narrow projection + one small rollup: at 100 TB
    * this is a single scan — the triage report that tells a pipeline
    * owner whether a bad drop is unreadable files or corrupt payloads
    * inside readable containers (very different upstream bugs). */
  private val q255 = GQ(
    "q255_media_quarantine_stages",
    (s, dir) => {
      import Multimodal.{AudioCodec, ImageCodec, VideoCodec}
      import graft.multimodal.Mp4Codec
      val d = mediaRows(s, dir)
        .withColumn("modality", pmod(col("doc_id"), lit(4)).cast("int"))
        .withColumn("kind",
          when(pmod(col("doc_id"), lit(7)) === 0, lit("header"))
            .when(pmod(col("doc_id"), lit(7)) === 1, lit("deep"))
            .otherwise(lit("ok")))
        .withColumn("v", pmod(col("doc_id"), lit(200)).cast("int"))
      // CASE branches evaluate lazily per row (the q253 pattern): each
      // row pays exactly one modality's encode, deep rows paying their
      // corrupted-fixture variant instead of surgery on a second blob
      val blob0 = when(col("modality") === 0,
          when(col("kind") === "deep", ImageCodec.encodeRasterCorruptPngUdf(
            lit(16), lit(16), col("v"), lit(0), lit(0)))
          .otherwise(ImageCodec.encodePngUdf(
            lit(16), lit(16), col("v"), lit(0), lit(0))))
        .when(col("modality") === 1,
          when(col("kind") === "deep", AudioCodec.encodeWav8Udf(
            lit(64), lit(8000), col("v")))
          // half the clean audio rows ship AIFF (modality-1 ids are
          // ≡ 1 mod 4, so %8 splits them 1 vs 5) — same stage contract
          .when(pmod(col("doc_id"), lit(8)) === 5, AudioCodec.encodeAiffUdf(
            lit(64), lit(8000), col("v"), lit(0), lit(1)))
          .otherwise(AudioCodec.encodeWavUdf(
            lit(64), lit(8000), col("v"), lit(0), lit(1))))
        .when(col("modality") === 2,
          when(col("kind") === "deep", VideoCodec.encodeBadFrameAviUdf(
            lit(3), lit(8), lit(8), lit(5), col("v"), lit(1)))
          .otherwise(VideoCodec.encodeSolidAviUdf(lit(3), lit(8), lit(8),
            lit(5), lit(-1), col("v"), lit(0))))
        // half the mp4 rows ship fragmented (doc_id % 8 == 3 vs == 7 —
        // modality-3 ids are all odd); both layouts share the same
        // stage contract: moov-read metadata survives an mdat cut
        .when(pmod(col("doc_id"), lit(8)) === 3,
          Mp4Codec.encodeSolidFragmentedMp4Udf(lit(3), lit(8), lit(8),
            lit(5), lit(-1), col("v"), lit(0)))
        .otherwise(Mp4Codec.encodeSolidMp4Udf(lit(3), lit(8), lit(8),
          lit(5), lit(-1), col("v"), lit(0)))
      val d2 = d.withColumn("blob0", blob0)
        .withColumn("blob",
          when(col("kind") === "header", expr("substring(blob0, 1, 20)"))
          // mp4's below-header depth is the payload cut, not a fixture
          .when(col("kind") === "deep" && col("modality") === 3,
            expr("substring(blob0, 1, length(blob0) - 5)"))
          .otherwise(col("blob0")))
        .withColumn("meta_ok",
          when(col("modality") === 0, ImageCodec.decodeMetaUdf(col("blob")).isNotNull)
          .when(col("modality") === 1, AudioCodec.decodeMetaUdf(col("blob")).isNotNull)
          .when(col("modality") === 2, VideoCodec.decodeMetaUdf(col("blob")).isNotNull)
          .otherwise(Mp4Codec.decodeMetaUdf(col("blob")).isNotNull))
        .withColumn("deep_ok",
          when(col("modality") === 0, ImageCodec.channelMeansUdf(col("blob")).isNotNull)
          .when(col("modality") === 1, AudioCodec.channelMeansUdf(col("blob")).isNotNull)
          .when(col("modality") === 2, VideoCodec.frameMeansUdf(col("blob")).isNotNull)
          .otherwise(Mp4Codec.frameMeansUdf(col("blob")).isNotNull))
        .withColumn("stage",
          when(!col("meta_ok"),
            when(col("modality").isin(0, 1), lit("header"))
              .otherwise(lit("container")))
          .when(!col("deep_ok"),
            when(col("modality") === 0, lit("raster"))
              .when(col("modality") === 1, lit("pcm"))
              .when(col("modality") === 2, lit("frame"))
              .otherwise(lit("sample")))
          .otherwise(lit("ok")))
      d2.groupBy("modality", "stage")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("modality", "stage")
    },
    Some("""SELECT CAST(m AS INTEGER) AS modality, stage,
              CAST(count(*) AS BIGINT) AS n_docs
            FROM (SELECT doc_id % 4 AS m,
                    CASE WHEN doc_id % 7 = 0 THEN
                           CASE WHEN doc_id % 4 IN (0, 1) THEN 'header'
                                ELSE 'container' END
                         WHEN doc_id % 7 = 1 THEN
                           CASE doc_id % 4 WHEN 0 THEN 'raster'
                                WHEN 1 THEN 'pcm' WHEN 2 THEN 'frame'
                                ELSE 'sample' END
                         ELSE 'ok' END AS stage
                  FROM documents)
            GROUP BY 1, 2
            ORDER BY modality, stage""")
  )

  /** MIXED-CONTAINER video near-dup: ONE binary column interleaving
    * all three real layouts the engine walks — RIFF/AVI, plain MP4,
    * fragmented MP4 (doc_id % 3) — decoded by per-row magic-byte
    * dispatch ([[graft.multimodal.MediaSniff]]: RIFF vs ftyp, the way
    * a real drop must be read because extensions lie), with the
    * recovered 64-frame mean sequences feeding the SAME temporal hash
    * + banded hamming pair join as q252. The oracle is container-
    * blind: group membership and flip arithmetic predict every pair
    * and its exact hamming distance regardless of which container
    * each side shipped in — which is the point: near-dup detection
    * must find an AVI re-encode of an MP4 original (and a DASH
    * re-package of either), and pairs here routinely straddle
    * containers because doc_id % 3 and the group id are independent.
    * Scalable shape unchanged from q252: per-row sniff+decode in the
    * scan projection, codegen'd hash, bucketed (chunk, value) join. */
  private val q256 = GQ(
    "q256_mixed_container_near_dup",
    (s, dir) => {
      import graft.multimodal.{MediaSniff, Mp4Codec}
      import Multimodal.VideoCodec
      val d = mediaRows(s, dir)
        .withColumn("g", pmod(col("doc_id"), lit(170L)))
        .withColumn("fb", when(pmod(col("doc_id"), lit(4)) === 1,
          expr("(doc_id div 170) % 64")).otherwise(lit(-1L)))
      val pBase = (0 until 8).map { j =>
        when(shiftright(col("g"), j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val p = when(col("fb") >= 0,
        pBase.bitwiseXOR(expr("shiftleft(1L, cast(fb as int))")))
        .otherwise(pBase)
      // materialized once pre-join — see q248's barrier note; CASE
      // branches evaluate lazily, so each row pays ONE encoder
      val fps = meansHash(d
        .withColumn("blob",
          when(pmod(col("doc_id"), lit(3)) === 0,
            VideoCodec.encodePatternAviUdf(p, lit(8), lit(8), lit(10)))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            Mp4Codec.encodePatternMp4Udf(p, lit(8), lit(8), lit(10)))
          .otherwise(
            Mp4Codec.encodePatternFragmentedMp4Udf(p, lit(8), lit(8), lit(10))))
        .withColumn("means", MediaSniff.frameMeansUdf(col("blob"))))
        .select("doc_id", "fp").localCheckpoint()
      graft.text.DedupOps.fingerprintPairs(fps, "doc_id", "fp", maxHamming = 2)
        .select(col("d1"), col("d2"), col("hamming").cast("int").as("hamming"))
        .orderBy("d1", "d2")
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 170 AS g,
                CASE WHEN doc_id % 4 = 1 THEN (doc_id // 170) % 64
                     ELSE -1 END AS fb
              FROM documents)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(CASE WHEN a.fb = b.fb THEN 0
                        WHEN a.fb = -1 OR b.fb = -1 THEN 1
                        ELSE 2 END AS INTEGER) AS hamming
            FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
            ORDER BY d1, d2""")
  )

  /** CROSS-MODAL poster-frame dedup: the leakage scan a training
    * pipeline runs between its IMAGE corpus and its VIDEO corpus — a
    * video whose poster (frame 0) duplicates a corpus image means the
    * same content sits in both modalities (e.g. eval images extracted
    * from training videos). Even doc_ids are pattern-PNG images
    * (aHash), odd doc_ids are poster clips in all three container
    * layouts (AVI / MP4 / fMP4, sniff-dispatched) whose frame 0 is the
    * SAME pattern shape — and the video side decodes ONLY frame 0
    * (firstFrame/firstSample resolve one range; no other frame is
    * touched), so at 100 TB poster dedup costs 1/nFrames of a full
    * decode. Both modalities' 64-bit fingerprints come from the SAME
    * ImageCodec.aHash and meet in the SAME banded hamming join; the
    * oracle predicts every pair, its exact distance, and whether it
    * straddles modalities, from doc_id arithmetic alone. */
  private val q257 = GQ(
    "q257_poster_frame_dedup",
    (s, dir) => {
      import Multimodal.ImageCodec
      import graft.multimodal.MediaSniff
      val d = mediaRows(s, dir)
        .withColumn("g", pmod(col("doc_id"), lit(160L)))
        .withColumn("fb", when(pmod(col("doc_id"), lit(5)) === 0,
          expr("(doc_id div 160) % 64")).otherwise(lit(-1L)))
      val pBase = (0 until 8).map { j =>
        when(shiftright(col("g"), j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val p = when(col("fb") >= 0,
        pBase.bitwiseXOR(expr("shiftleft(1L, cast(fb as int))")))
        .otherwise(pBase)
      // lazily-evaluated CASE: each row pays one image encode OR one
      // clip encode + ONE-frame decode; materialized once pre-join
      // (the q248 barrier note)
      val blob = when(pmod(col("doc_id"), lit(2)) === 0,
          ImageCodec.encodePatternPngUdf(p, lit(4)))
        .when(pmod(col("doc_id"), lit(4)) === 1, MediaSniff.encodePosterClipUdf(
          p, lit(5), lit(10), lit(4), lit("avi")))
        .when(pmod(col("doc_id"), lit(8)) === 3, MediaSniff.encodePosterClipUdf(
          p, lit(5), lit(10), lit(4), lit("mp4")))
        .otherwise(MediaSniff.encodePosterClipUdf(
          p, lit(5), lit(10), lit(4), lit("fmp4")))
      val fps = d.withColumn("blob", blob)
        .withColumn("fp", when(pmod(col("doc_id"), lit(2)) === 0,
          ImageCodec.aHashUdf(col("blob")))
          .otherwise(MediaSniff.posterHashUdf(col("blob"))))
        .select("doc_id", "fp").localCheckpoint()
      graft.text.DedupOps.fingerprintPairs(fps, "doc_id", "fp", maxHamming = 2)
        .select(col("d1"), col("d2"),
          col("hamming").cast("int").as("hamming"),
          (pmod(col("d1"), lit(2)) =!= pmod(col("d2"), lit(2)))
            .cast("int").as("cross_modal"))
        .orderBy("d1", "d2")
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 160 AS g,
                CASE WHEN doc_id % 5 = 0 THEN (doc_id // 160) % 64
                     ELSE -1 END AS fb
              FROM documents)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(CASE WHEN a.fb = b.fb THEN 0
                        WHEN a.fb = -1 OR b.fb = -1 THEN 1
                        ELSE 2 END AS INTEGER) AS hamming,
                   CAST(CASE WHEN a.doc_id % 2 <> b.doc_id % 2
                        THEN 1 ELSE 0 END AS INTEGER) AS cross_modal
            FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
            ORDER BY d1, d2""")
  )

  /** Container NORMALIZATION pass: transcode a mixed drop — AVI,
    * plain MP4, fragmented MP4, interleaved in one column and
    * sniff-dispatched per row — to ONE canonical layout (plain
    * moov-first MP4), then decode the OUTPUT to prove the payload
    * survived byte-identical: geometry, sample count, timing, and
    * first/last frame pixels all re-read from the normalized blob.
    * Corrupt inputs (1 doc in 7 header-cut) quarantine THROUGH the
    * transcode as NULL — they must not become empty-but-valid outputs.
    * This is the standardization stage a real pipeline runs before
    * handing video to consumers that want one demuxer; per-row
    * projection, no shuffle beyond the spine and output sort. */
  private val q258 = GQ(
    "q258_container_normalize",
    (s, dir) => {
      import Multimodal.VideoCodec
      import graft.multimodal.{MediaSniff, Mp4Codec}
      val d = mediaRows(s, dir)
        .withColumn("nf", (lit(3) + pmod(col("doc_id"), lit(5))).cast("int"))
        .withColumn("fps", (lit(5) + pmod(col("doc_id"), lit(8))).cast("int"))
        .withColumn("va", pmod(col("doc_id") * 7, lit(200)).cast("int"))
        .withColumn("cut", when(pmod(col("doc_id"), lit(2)) === 0,
          (lit(1) + pmod(col("doc_id"), (col("nf") - 1).cast("long"))).cast("int"))
          .otherwise(lit(-1)))
      d.withColumn("blob0",
          when(pmod(col("doc_id"), lit(3)) === 0, VideoCodec.encodeSolidAviUdf(
            col("nf"), lit(8), lit(8), col("fps"), col("cut"),
            col("va"), col("va") + 40))
          .when(pmod(col("doc_id"), lit(3)) === 1, Mp4Codec.encodeSolidMp4Udf(
            col("nf"), lit(8), lit(8), col("fps"), col("cut"),
            col("va"), col("va") + 40))
          .otherwise(Mp4Codec.encodeSolidFragmentedMp4Udf(
            col("nf"), lit(8), lit(8), col("fps"), col("cut"),
            col("va"), col("va") + 40)))
        .withColumn("blob", when(pmod(col("doc_id"), lit(7)) === 0,
          expr("substring(blob0, 1, 20)")).otherwise(col("blob0")))
        .withColumn("norm", MediaSniff.transcodeToMp4Udf(col("blob")))
        .withColumn("meta", Mp4Codec.decodeMetaUdf(col("norm")))
        .withColumn("means", Mp4Codec.frameMeansUdf(col("norm")))
        .select(
          col("doc_id"),
          col("meta._1").as("width"),
          col("meta._3").as("n_samples"),
          col("meta._4").as("timescale"),
          col("meta._5").as("duration_ms"),
          get(col("means"), lit(0)).as("mean_first"),
          get(col("means"), col("meta._3") - 1).as("mean_last"),
          MediaSniff.containerUdf(col("norm")).as("normalized"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(8 AS INTEGER) END AS width,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(nf AS INTEGER) END AS n_samples,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(fps AS INTEGER) END AS timescale,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(nf * 1000 // fps AS BIGINT) END AS duration_ms,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(va AS DOUBLE) END AS mean_first,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(CASE WHEN cut >= 0 THEN va + 40 ELSE va END
                     AS DOUBLE) END AS mean_last,
              CASE WHEN bad = 1 THEN NULL ELSE 'mp4' END AS normalized
            FROM (SELECT doc_id,
                    3 + doc_id % 5 AS nf,
                    5 + doc_id % 8 AS fps,
                    (doc_id * 7) % 200 AS va,
                    CASE WHEN doc_id % 2 = 0
                         THEN 1 + doc_id % (2 + doc_id % 5)
                         ELSE -1 END AS cut,
                    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS bad
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** The byte-repetition pattern code the perceptual gates share, as a
    * reusable Column: bit j of `g` (g < 256) sets byte j of the 64-bit
    * pattern, so two patterns from different g differ by ≥ 8 bits —
    * the separation that makes hamming-2 dedup outcomes exactly
    * predictable in SQL. */
  private def repPattern(g: org.apache.spark.sql.Column) =
    (0 until 8).map { j =>
      when(shiftright(g, j).bitwiseAND(lit(1L)) =!= 0,
        lit(255L << (8 * j))).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** The MEDIA twin of q218 (text) and q242 (vectors) — the streaming
    * ingest-dedup loop run against a PERSISTED poster-fingerprint
    * corpus: media blobs stream in (bytes at rest, as a real drop
    * arrives), and each micro-batch sniff-decodes posters, drops
    * quarantined blobs, probes the corpus table with the asymmetric
    * banded hamming join ([[graft.text.DedupOps.fingerprintProbe]] —
    * batch × corpus ONLY, never corpus × corpus), drops near-dup
    * losers, and appends the survivors' fingerprints back — so the
    * NEXT batch dedups against them. The batch re-ingests the whole
    * corpus' content RE-PACKAGED IN A DIFFERENT CONTAINER (an fMP4
    * re-package of an AVI original must die — the cross-container
    * kill only a container-blind fingerprint can make), plus novel
    * content that must survive, plus header-cut blobs that must
    * quarantine (neither killed-as-dup nor appended). Maintenance is
    * proven in-gate: a re-ingest of the novels under fresh ids must
    * collide with their appended fingerprints. Output = final corpus
    * membership, exactly replayable by the oracle. */
  private val q259 = GQ(
    "q259_stream_media_ingest",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.streaming.Trigger
      import graft.multimodal.MediaSniff
      import graft.tables.GraftTable
      import graft.text.DedupOps
      val spine = mediaRows(s, dir)
      def containerOf(shift: Int) = // avi / mp4 / fmp4 by id arithmetic
        expr(s"element_at(array('avi','mp4','fmp4'), " +
          s"cast((doc_id + $shift) % 3 as int) + 1)")
      def clip(p: org.apache.spark.sql.Column, shift: Int) =
        MediaSniff.encodePosterClipUdf(p, lit(2), lit(10), lit(4),
          containerOf(shift))
      // the persisted corpus: poster fingerprints of the initial drop
      val corpusFps = spine
        .withColumn("blob", clip(repPattern(pmod(col("doc_id"), lit(50L))), 0))
        .select(col("doc_id"), MediaSniff.posterHashUdf(col("blob")).as("fp"))
      val t = GraftTable.createFrom(s, Scratch.dir("medialoop"), corpusFps)
      // the streamed drop: every corpus doc re-packaged in a DIFFERENT
      // container (+100000, must die), novel patterns (+200000, g+100
      // differs from every corpus g by ≥ 8 bits, must survive), and
      // header-cut blobs (+300000, must quarantine)
      val copies = spine.select((col("doc_id") + 100000).as("doc_id"),
        clip(repPattern(pmod(col("doc_id"), lit(50L))), 1).as("blob"))
      val novel = spine.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          clip(repPattern(pmod(col("doc_id"), lit(50L)) + 100), 2).as("blob"))
      val corrupt = spine.filter(pmod(col("doc_id"), lit(10)) === 5)
        .withColumn("blob0", clip(repPattern(pmod(col("doc_id"), lit(50L))), 0))
        .select((col("doc_id") + 300000).as("doc_id"),
          expr("substring(blob0, 1, 20)").as("blob"))
      val in = Scratch.dir("medialoopsrc")
      // repartition(1), NOT coalesce(1): coalesce is narrow, so it pulled
      // every per-row container ENCODE into the single writer task
      // (ProfSteps r19: 1.45 s serial of a 2.3 s gate body). The shuffle
      // moves the encoded blobs once and keeps the encode on all cores;
      // one output file still means one deterministic micro-batch.
      copies.unionByName(novel).unionByName(corrupt)
        .repartition(1).write.mode("overwrite").parquet(in)
      val nNovel = novel.count()
      val stream = s.readStream.schema(copies.schema).parquet(in)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Scratch.dir("medialoopckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          // decode once per batch: the posterHash chain is referenced
          // by both the probe and the anti-join (the q248 barrier note)
          val fps = b.select(col("doc_id"),
              MediaSniff.posterHashUdf(col("blob")).as("fp"))
            .filter(col("fp").isNotNull) // quarantined blobs drop here
            .localCheckpoint()
          val losers = DedupOps.fingerprintProbe(fps, t.read(),
            "doc_id", "fp", maxHamming = 2)
            .select(col("batch_id").as("doc_id")).distinct()
          t.append(fps.join(losers, Seq("doc_id"), "left_anti"))
          ()
        }.start()
      stream.awaitTermination()
      // maintenance proof: the appended novels must now be probe-able —
      // fresh-id re-encodes of them collide with their indexed copies
      val reprobe = DedupOps.fingerprintProbe(
        novel.select((col("doc_id") + 300000).as("doc_id"),
          MediaSniff.posterHashUdf(col("blob")).as("fp")),
        t.read(), "doc_id", "fp", maxHamming = 2)
        .select("batch_id").distinct()
      require(reprobe.count() == nNovel,
        "corpus append must make a re-ingest of the survivors collide")
      t.read().select("doc_id").orderBy("doc_id")
    },
    Some("""SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + 200000 AS doc_id FROM documents
            WHERE doc_id % 10 = 0
            ORDER BY doc_id""")
  )

  /** MP4 AUDIO DEMUX: real video files carry an audio track beside the
    * video, and the audio-preprocessing half of a training pipeline
    * (ASR, audio quality, energy hashing) starts by EXTRACTING it.
    * Per-doc two-track MP4s — Motion-PNG video + constant-fill PCM16
    * audio, a third of rows storing the big-endian `twos` sample
    * entry instead of `sowt` — are demuxed per row: the audio view
    * reads channels/bits/rate/samples/duration off the soun trak's
    * tables, extractAudioWav re-wraps the PCM as WAV (byte-swapping
    * `twos`), and the ordinary AudioCodec decodes THAT, proving the
    * demux composes with every existing audio stage. The oracle is
    * byte-order-blind for all numeric columns (the WAV/AIFF precedent,
    * this time inside one container) and predicts the stored fourcc
    * exactly; ~1 doc in 7 is header-cut and must quarantine through
    * both views. Narrow per-row projections: the demux never shuffles. */
  private val q260 = GQ(
    "q260_mp4_audio_demux",
    (s, dir) => {
      import Multimodal.AudioCodec
      import graft.multimodal.Mp4Codec
      val d = mediaRows(s, dir)
        .withColumn("nf", (lit(2) + pmod(col("doc_id"), lit(3))).cast("int"))
        .withColumn("va", pmod(col("doc_id"), lit(200)).cast("int"))
        .withColumn("frames", (lit(50) + pmod(col("doc_id"), lit(200))).cast("int"))
        .withColumn("ch", (lit(1) + pmod(col("doc_id"), lit(2))).cast("int"))
        .withColumn("v0", (pmod(col("doc_id") * 7, lit(60001)) - 30000).cast("int"))
        .withColumn("v1", (pmod(col("doc_id") * 11, lit(60001)) - 30000).cast("int"))
      d.withColumn("blob0",
          when(pmod(col("doc_id"), lit(3)) === 1,
            Mp4Codec.encodeSolidMp4WithAudioBeUdf(
              col("nf"), lit(8), lit(8), lit(5), col("va"), col("frames"),
              lit(8000), col("ch"), col("v0"), col("v1")))
          .otherwise(Mp4Codec.encodeSolidMp4WithAudioUdf(
            col("nf"), lit(8), lit(8), lit(5), col("va"), col("frames"),
            lit(8000), col("ch"), col("v0"), col("v1"))))
        .withColumn("blob", when(pmod(col("doc_id"), lit(7)) === 0,
          expr("substring(blob0, 1, 20)")).otherwise(col("blob0")))
        .withColumn("vmeta", Mp4Codec.decodeMetaUdf(col("blob")))
        .withColumn("ameta", Mp4Codec.decodeAudioMetaUdf(col("blob")))
        .withColumn("wav", Mp4Codec.extractAudioWavUdf(col("blob")))
        .withColumn("wmeta", AudioCodec.decodeMetaUdf(col("wav")))
        .withColumn("means", AudioCodec.channelMeansUdf(col("wav")))
        .withColumn("pk", AudioCodec.peakUdf(col("wav")))
        .select(col("doc_id"),
          col("vmeta._3").as("v_samples"),
          col("ameta._1").as("channels"), col("ameta._2").as("bits"),
          col("ameta._3").as("sample_rate"), col("ameta._4").as("a_samples"),
          col("ameta._5").as("a_duration_ms"), col("ameta._6").as("codec"),
          col("wmeta._4").as("wav_frames"),
          col("means")(0).as("mean_c0"), col("pk").as("peak"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(nf AS INTEGER) END AS v_samples,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(ch AS INTEGER) END AS channels,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(16 AS INTEGER) END AS bits,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(8000 AS INTEGER) END AS sample_rate,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(frames AS INTEGER) END AS a_samples,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(frames * 1000 // 8000 AS BIGINT) END AS a_duration_ms,
              CASE WHEN bad = 1 THEN NULL
                   WHEN doc_id % 3 = 1 THEN 'twos'
                   ELSE 'sowt' END AS codec,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(frames AS BIGINT) END AS wav_frames,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(v0 AS DOUBLE) END AS mean_c0,
              CASE WHEN bad = 1 THEN NULL ELSE
                CAST(CASE WHEN ch = 2 THEN greatest(abs(v0), abs(v1))
                     ELSE abs(v0) END AS INTEGER) END AS peak
            FROM (SELECT doc_id,
                    2 + doc_id % 3 AS nf,
                    50 + doc_id % 200 AS frames,
                    1 + doc_id % 2 AS ch,
                    (doc_id * 7) % 60001 - 30000 AS v0,
                    (doc_id * 11) % 60001 - 30000 AS v1,
                    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS bad
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** MIXED-CONTAINER audio decode: ONE binary column interleaving the
    * three audio containers a real drop carries — RIFF/WAVE, FORM/AIFF,
    * and audio-only `.m4a` (ISO-BMFF, no video track) — normalized by
    * ONE per-row magic-byte dispatch ([[graft.multimodal.MediaSniff
    * .audioToDecodable]]: WAV/AIFF pass through untouched, m4a demuxes
    * its soun track to WAV) and then decoded by the ordinary
    * AudioCodec stages. The audio twin of q256/q258: after the
    * dispatch, metadata/means/peak run container-blind, so the oracle
    * predicts every numeric column identically across all three
    * layouts; the container column reports the sniff itself (readable
    * even on the corrupt rows — 20-byte cuts keep the magic — while
    * every decode stage correctly quarantines them). */
  private val q261 = GQ(
    "q261_mixed_audio_decode",
    (s, dir) => {
      import Multimodal.AudioCodec
      import graft.multimodal.{MediaSniff, Mp4Codec}
      val d = mediaRows(s, dir)
        .withColumn("frames", (lit(50) + pmod(col("doc_id"), lit(200))).cast("int"))
        .withColumn("ch", (lit(1) + pmod(col("doc_id"), lit(2))).cast("int"))
        .withColumn("v0", (pmod(col("doc_id") * 7, lit(60001)) - 30000).cast("int"))
        .withColumn("v1", (pmod(col("doc_id") * 11, lit(60001)) - 30000).cast("int"))
      d.withColumn("blob0",
          when(pmod(col("doc_id"), lit(3)) === 0, AudioCodec.encodeWavUdf(
            col("frames"), lit(8000), col("v0"), col("v1"), col("ch")))
          .when(pmod(col("doc_id"), lit(3)) === 1, AudioCodec.encodeAiffUdf(
            col("frames"), lit(8000), col("v0"), col("v1"), col("ch")))
          .otherwise(Mp4Codec.encodeSolidMp4WithAudioUdf( // audio-only m4a
            lit(0), lit(8), lit(8), lit(5), lit(0), col("frames"),
            lit(8000), col("ch"), col("v0"), col("v1"))))
        .withColumn("blob", when(pmod(col("doc_id"), lit(7)) === 0,
          expr("substring(blob0, 1, 20)")).otherwise(col("blob0")))
        .withColumn("container", MediaSniff.audioContainerUdf(col("blob")))
        .withColumn("norm", MediaSniff.audioToDecodableUdf(col("blob")))
        .withColumn("meta", AudioCodec.decodeMetaUdf(col("norm")))
        .withColumn("means", AudioCodec.channelMeansUdf(col("norm")))
        .withColumn("pk", AudioCodec.peakUdf(col("norm")))
        .select(col("doc_id"), col("container"),
          col("meta._1").as("sample_rate"), col("meta._2").as("channels"),
          col("meta._3").as("bits"), col("meta._4").as("n_frames"),
          col("meta._5").as("duration_ms"),
          col("means")(0).as("mean_c0"), col("pk").as("peak"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'wav'
                   WHEN 1 THEN 'aiff' ELSE 'mp4' END AS container,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(8000 AS INTEGER) END AS sample_rate,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(ch AS INTEGER) END AS channels,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(16 AS INTEGER) END AS bits,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(frames AS BIGINT) END AS n_frames,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(frames * 1000 // 8000 AS BIGINT) END AS duration_ms,
              CASE WHEN bad = 1 THEN NULL
                   ELSE CAST(v0 AS DOUBLE) END AS mean_c0,
              CASE WHEN bad = 1 THEN NULL ELSE
                CAST(CASE WHEN ch = 2 THEN greatest(abs(v0), abs(v1))
                     ELSE abs(v0) END AS INTEGER) END AS peak
            FROM (SELECT doc_id,
                    50 + doc_id % 200 AS frames,
                    1 + doc_id % 2 AS ch,
                    (doc_id * 7) % 60001 - 30000 AS v0,
                    (doc_id * 11) % 60001 - 30000 AS v1,
                    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS bad
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** Query replay: recorded workload re-issued at original offsets,
    * results joined back (`REPLAY/00-Functions.py:391-438`). Output is the
    * deterministic projection (id, rows, status). */
  private val q132 = GQ(
    "q132_query_replay",
    (s, dir) => {
      Tables.registerAll(s, dir)
      val rs = QueryReplay.replay(s, Seq(
        QueryReplay.ReplayRecord("q1", "SELECT count(*) FROM orders", 0),
        QueryReplay.ReplayRecord("q2",
          "SELECT count(*) FROM lineitem WHERE l_quantity > 25", 40),
        QueryReplay.ReplayRecord("q3", "SELECT count(*) FROM no_such_table", 80)),
        speedup = 4.0)
      QueryReplay.resultsDF(s, rs)
        .select("queryId", "rows", "status").orderBy("queryId")
    },
    Some("""SELECT * FROM (VALUES
              ('q1', CAST(1 AS BIGINT), 'FINISHED'),
              ('q2', CAST(1 AS BIGINT), 'FINISHED'),
              ('q3', CAST(-1 AS BIGINT), 'FAILED')
            ) r(queryId, rows, status) ORDER BY queryId""")
  )

  override def queries: Seq[GQ] =
    Seq(q130, q131, q132, q246, q247, q248, q249, q250, q251, q252, q253,
      q254, q255, q256, q257, q258, q259, q260, q261)
}
