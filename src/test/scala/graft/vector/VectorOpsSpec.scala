package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine matches hand computation") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val sims = VectorOps.cosineTopK(df, Seq(1.0, 0.0), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(1L) === 1.0)
    assert(sims(2L) === 0.0)
    assert(math.abs(sims(3L) - math.sqrt(0.5)) < 1e-3)
  }

  test("lshTopK recalls planted near-duplicates of the query") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    // plant 5 near-copies of the query vector (tiny perturbation)
    val planted = (1 to 5).map(i =>
      (100000L + i, q.zipWithIndex.map { case (x, j) =>
        (x + (if (j == 0) i * 0.001 else 0.0)).toFloat }.toArray))
      .toDF("vec_id", "embedding")
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val got = VectorOps.lshTopK(corpus, q, 6, nPlanes = 8)
      .collect().map(_.getLong(0)).toSet
    // the query itself + all 5 planted dups must be found (cosine ≈ 1)
    assert(got.contains(0L))
    assert((1 to 5).forall(i => got.contains(100000L + i)))
  }

  test("exactPairsWithinKey equals the naive within-key join at any block size") {
    val emb = Tables.t(spark, sf, "embeddings")
    def naive = {
      val e = emb.select(col("vec_id"), col("label"),
        VectorOps.normalized(col("embedding")).as("v")).localCheckpoint(true)
      e.alias("a").join(e.alias("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          round(VectorOps.dotPre(col("a.v"), col("b.v")) + lit(1e-9), 4).as("sim"))
        .filter(col("sim") >= 0.35)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val want = naive
    for (bs <- Seq(7, 50, 1000000)) {
      val got = VectorOps.exactPairsWithinKey(emb, "label", 0.35, blockSize = bs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"blockSize=$bs")
    }
  }

  test("nearDupPairs finds planted duplicate pair and no false positives") {
    val emb = Tables.t(spark, sf, "embeddings").select("vec_id", "embedding")
    val v = emb.filter(col("vec_id") === 7).head().getSeq[Float](1).toArray
    val planted = Seq((200000L, v.clone())).toDF("vec_id", "embedding")
    val pairs = VectorOps.nearDupPairs(emb.unionByName(planted), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((7L, 200000L)))
  }
}
