package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("frame sampling reassembles to the original prefix") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val frames = Multimodal.sampleFrames(df, "blob", frameSize = 4, stride = 1)
      .orderBy("frame_idx")
      .select(col("frame").cast("string"))
      .collect().map(_.getString(0))
    assert(frames.toSeq === Seq("abcd", "efgh", "ij"))
  }

  test("stride keeps every nth frame") {
    val df = Seq((1L, "aabbccddee")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val idx = Multimodal.sampleFrames(df, "blob", frameSize = 2, stride = 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq === Seq(0, 2, 4))
  }

  test("feature extraction is deterministic, fixed-length, in [0,1)") {
    val docs = Tables.t(spark, sf, "documents").limit(20)
      .withColumn("blob", col("text").cast("binary"))
    val a = Multimodal.extractFeatures(docs, "blob", dims = 8)
      .select("doc_id", "media_features").collect()
    val b = Multimodal.extractFeatures(docs, "blob", dims = 8)
      .select("doc_id", "media_features").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 8)
      assert(v.forall(x => x >= 0.0 && x < 1.0))
    }
  }

  test("media metadata carries size and type") {
    val df = Seq((1L, "hello")).toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val m = Multimodal.withMediaMeta(df, "blob", "image", "png")
      .select("media_meta.media_type", "media_meta.codec", "media_meta.size_bytes")
      .head()
    assert((m.getString(0), m.getString(1), m.getLong(2)) === ("image", "png", 5L))
  }
}
