package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  test("nprobe = nlist degenerates to exact brute force") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = VectorOps.cosineTopK(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Ivf.topK(emb, q, 5, nlist = 8, nprobe = 8, iters = 2)
      .select("vec_id", "sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === exact)
  }

  test("kmeans partitions every vector into k cells") {
    val emb = Tables.t(spark, sf, "embeddings")
    val (indexed, centroids) = Ivf.index(emb, k = 8, iters = 2)
    assert(centroids.count() === 8)
    assert(indexed.count() === emb.count())
    val cells = indexed.select("cell").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("probing finds planted near-duplicates of the query") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val planted = (1 to 3).map(i =>
      (300000L + i, q.map(x => (x + i * 1e-4).toFloat).toArray))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(99))
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(planted.select("vec_id", "embedding"))
    // near-identical vectors land in the query's cell → top-probe finds them
    val got = Ivf.topK(corpus, q, 4, nlist = 8, nprobe = 1, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(0L))
    assert((1 to 3).forall(i => got.contains(300000L + i)))
  }
}
