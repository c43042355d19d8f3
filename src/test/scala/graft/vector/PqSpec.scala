package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Product-quantization semantics: lossless corner equals exact cosine,
  * real-data recall against the brute-force baseline, determinism, and
  * code-word ranges. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** 40 vectors of 8 dims built from 3 subvector patterns per subspace:
    * with ksub >= distinct subvectors every point sits on a centroid, so
    * reconstruction is exact and ADC cosine == exact cosine. */
  private def planted = {
    val pat = Seq(
      Seq(1.0, 0.0, 2.0, 1.0), Seq(0.0, 3.0, 1.0, 0.0), Seq(2.0, 2.0, 0.0, 1.0))
    (0L until 40L).map { i =>
      val a = pat((i % 3).toInt)
      val b = pat(((i / 3) % 3).toInt)
      (i, (a ++ b).map(_.toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("lossless corner: ADC cosine equals exact cosine when codes cover the data") {
    val q = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val adc = Pq.adcTopK(planted, q, 40, m = 2, ksub = 8, iters = 3)
      .as[(Long, Double)].collect().toMap
    val exact = VectorOps.cosineTopK(planted, q, 40)
      .as[(Long, Double)].collect().toMap
    assert(adc.keySet == exact.keySet)
    adc.foreach { case (id, sim) =>
      assert(math.abs(sim - exact(id)) < 1e-3, s"vec $id: adc=$sim exact=${exact(id)}")
    }
  }

  test("recall@10 against brute force on real embeddings") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val exact = VectorOps.cosineTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    // pure ADC: coarse but cheap (8-byte codes)
    val adc = Pq.adcTopK(emb, q, 10, m = 8, ksub = 64, iters = 3)
      .select("vec_id").as[Long].collect().toSet
    assert((exact intersect adc).size >= 5,
      s"ADC recall@10 too low: ${(exact intersect adc).size}/10")
    // production shape: ADC shortlist (20% of corpus) + exact rerank
    val rr = Pq.topKRerank(emb, q, 10, fetch = 100, m = 8, ksub = 16, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert((exact intersect rr).size >= 9,
      s"rerank recall@10 too low: ${(exact intersect rr).size}/10")
  }

  test("a zero-norm query vector is rejected before training starts") {
    intercept[IllegalArgumentException] {
      Pq.adcTopK(planted, Seq.fill(8)(0.0), 5)
    }
  }

  test("encoding is deterministic and code words stay in range") {
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = Pq.trainCodebooks(emb, m = 8, ksub = 16, iters = 2)
    val cents2 = Pq.trainCodebooks(emb, m = 8, ksub = 16, iters = 2)
    assert(cents == cents2, "training must be deterministic")
    val codes = Pq.encode(emb, cents, 8).select("codes")
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)))
    assert(codes.distinct.size > 1, "codes must discriminate vectors")
  }
}
