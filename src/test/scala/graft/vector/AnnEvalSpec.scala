package graft.vector

import graft.SparkTestBase

/** AnnEval.ivfRecall semantics: full probe recovers exact ground truth,
  * planted clusters keep recall high at nprobe=1, bad probes lose it,
  * and the input contracts hold. */
class AnnEvalSpec extends SparkTestBase {
  import spark.implicits._

  /** Two well-separated planted clusters in 4-d (the ClusterSampleSpec
    * geometry): ids 0..9 hug (1,0,0,0), ids 10..19 hug (0,1,0,0). */
  private def planted = (0 until 20).map { i =>
    val drift = 0.02f * (i % 10)
    if (i < 10) (i.toLong, Seq(1f, drift, 0f, 0f))
    else (i.toLong, Seq(drift, 1f, 0f, 0f))
  }.toDF("vec_id", "embedding")

  test("nprobe = nlist probes everything: recall is exactly 1 for every query") {
    val got = AnnEval.ivfRecall(planted, k = 5, nlist = 2, nprobe = 2,
        nQueries = 4)
      .select("query_id", "hits", "recall_at_k")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.forall(r => r._2 == 5 && r._3 == 1.0), got.toString)
  }

  test("on separated clusters nprobe=1 already reaches full recall") {
    // each query's true top-5 are its own cluster-mates, and the probe
    // lands on exactly that cell
    val got = AnnEval.ivfRecall(planted, k = 5, nlist = 2, nprobe = 1,
        nQueries = 12)
      .select("recall_at_k").as[Double].collect()
    assert(got.length == 12)
    assert(got.forall(_ == 1.0), got.mkString(","))
  }

  test("recall drops when k spans both clusters but only one cell is probed") {
    // k = 15 > cluster size 10: the true top-15 must cross clusters, a
    // 1-cell probe can return at most 10 → recall <= 10/15
    val got = AnnEval.ivfRecall(planted, k = 15, nlist = 2, nprobe = 1,
        nQueries = 4)
      .select("recall_at_k").as[Double].collect()
    // output is rounded to 4dp, so the 10/15 cap reads 0.6667
    assert(got.forall(r => r > 0.0 && r <= 0.6667 + 1e-9), got.mkString(","))
  }

  test("pqRecall: full-corpus shortlist with generous fetch recovers exact top-k") {
    // fetch = corpus size → the shortlist contains everything, the rerank
    // is exact brute force, recall must be exactly 1
    val got = AnnEval.pqRecall(planted, k = 5, fetch = 20, m = 2, ksub = 4,
        iters = 1, nQueries = 4)
      .select("recall_at_k").as[Double].collect()
    assert(got.length == 4)
    assert(got.forall(_ == 1.0), got.mkString(","))
  }

  test("pqRecall on the documents-scale embeddings stays above the tuned floor") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val rec = AnnEval.pqRecall(emb, k = 10, fetch = 100, m = 8, ksub = 16,
        iters = 1, nQueries = 10)
      .select("recall_at_k").as[Double].collect()
    assert(rec.length == 10)
    val mean = rec.sum / rec.length
    // the q231 operating point: a 100-id ADC shortlist over 16-cell
    // codebooks must keep the bulk of the true top-10
    assert(mean >= 0.8, s"mean PQ recall@10 collapsed to $mean")
  }

  test("ivfPqRecall: nprobe = nlist and full fetch degenerate to exact recall 1") {
    val got = AnnEval.ivfPqRecall(planted, k = 5, nlist = 2, nprobe = 2,
        fetch = 20, m = 2, ksub = 4, ivfIters = 2, pqIters = 1, nQueries = 4)
      .select("recall_at_k").as[Double].collect()
    assert(got.length == 4)
    assert(got.forall(_ == 1.0), got.mkString(","))
  }

  test("ivfPqRecall: partial probe on separated clusters keeps in-cluster recall") {
    // nprobe=1 lands each query on its own planted cluster; the 2-subspace
    // PQ codes rank cluster-mates first, so recall stays 1 at k=5
    val got = AnnEval.ivfPqRecall(planted, k = 5, nlist = 2, nprobe = 1,
        fetch = 10, m = 2, ksub = 4, ivfIters = 2, pqIters = 1, nQueries = 8)
      .select("recall_at_k").as[Double].collect()
    assert(got.length == 8)
    assert(got.forall(_ == 1.0), got.mkString(","))
  }

  test("pq/ivfPq recall harnesses reject invalid parameters") {
    intercept[IllegalArgumentException](
      AnnEval.pqRecall(planted, k = 0, fetch = 10, nQueries = 1))
    intercept[IllegalArgumentException](
      AnnEval.pqRecall(planted, k = 10, fetch = 5, nQueries = 1))
    intercept[IllegalArgumentException](
      AnnEval.ivfPqRecall(planted, k = 5, nlist = 2, nprobe = 3, fetch = 10,
        nQueries = 1))
  }

  test("ivfRecall rejects invalid parameters") {
    intercept[IllegalArgumentException](
      AnnEval.ivfRecall(planted, k = 0, nlist = 2, nprobe = 1, nQueries = 1))
    intercept[IllegalArgumentException](
      AnnEval.ivfRecall(planted, k = 5, nlist = 2, nprobe = 3, nQueries = 1))
    intercept[IllegalArgumentException](
      AnnEval.ivfRecall(planted, k = 5, nlist = 2, nprobe = 0, nQueries = 1))
    intercept[IllegalArgumentException](
      AnnEval.ivfRecall(planted, k = 5, nlist = 2, nprobe = 1, nQueries = 0))
  }
}
