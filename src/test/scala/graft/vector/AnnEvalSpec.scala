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
