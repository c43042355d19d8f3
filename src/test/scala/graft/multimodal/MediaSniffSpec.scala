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
