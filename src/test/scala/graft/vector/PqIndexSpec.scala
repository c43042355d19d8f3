package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.tables.GraftTable

/** Persisted PQ index semantics: codebook property round-trip, reopened
  * search ≡ in-session search, and the probe-cost shape (searches read
  * codes only; rerank touches only the shortlist). */
class PqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables.t(spark, sf, "embeddings")

  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("codebook property encoding round-trips") {
    val cbs = Seq(
      Pq.Codebook(0, 0, Seq(1.5, -2.25, 0.0)),
      Pq.Codebook(0, 3, Seq(0.125, 4.0, -1.0)),
      Pq.Codebook(1, 0, Seq(-0.5, 0.25, 9.0)))
    assert(PqIndex.decodeCodebooks(PqIndex.encodeCodebooks(cbs)) == cbs)
  }

  test("a reopened index recovers the trained codebooks exactly") {
    val path = scratch("pqidx")
    PqIndex.build(emb, path, m = 8, ksub = 16, iters = 1)
    val reopened = GraftTable.load(spark, path)
    val recovered = PqIndex.codebooks(reopened)
    val retrained = Pq.trainCodebooks(emb, m = 8, ksub = 16, iters = 1)
    assert(recovered == retrained,
      "codebooks must survive the TBLPROPERTIES round-trip bit-exactly")
  }

  test("reopened ADC search equals the in-session ADC search") {
    val path = scratch("pqidx2")
    PqIndex.build(emb, path, m = 8, ksub = 16, iters = 1)
    val reopened = GraftTable.load(spark, path)
    val persisted = PqIndex.adcTopK(reopened, qv, 10)
      .as[(Long, Double)].collect().toSeq
    val inSession = Pq.adcTopK(emb, qv, 10, m = 8, ksub = 16, iters = 1)
      .as[(Long, Double)].collect().toSeq
    assert(persisted == inSession)
  }

  test("rerank search recovers the exact top-k and only reranks the shortlist") {
    val path = scratch("pqidx3")
    val t = PqIndex.build(emb, path, m = 8, ksub = 16, iters = 2)
    val df = PqIndex.topKRerank(t, emb, qv, 10, fetch = 100)
    val got = df.select("vec_id").as[Long].collect().toSet
    val exact = VectorOps.cosineTopK(emb, qv, 10)
      .select("vec_id").as[Long].collect().toSet
    assert((got intersect exact).size >= 9,
      s"rerank recall too low: ${(got intersect exact).size}/10")
    // the full-precision side must arrive through a broadcast semi-join
    // (fetch-bounded), never a full-corpus sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"rerank must semi-join the shortlist:\n$plan")
  }

  test("a zero-norm query vector is rejected at the index surface") {
    val path = scratch("pqidx4")
    val t = PqIndex.build(emb, path, m = 8, ksub = 16, iters = 1)
    intercept[IllegalArgumentException] {
      PqIndex.adcTopK(t, Seq.fill(qv.size)(0.0), 10)
    }
  }
}
