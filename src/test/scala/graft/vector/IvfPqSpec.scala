package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.tables.GraftTable

/** Combined IVF+PQ index semantics: full-probe equivalence to the pure-PQ
  * chain, reopen-from-storage equivalence, partial-probe file pruning,
  * recall under partial probes, and the zero-norm query contract. */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables.t(spark, sf, "embeddings")

  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("full probe equals the pure-PQ shortlist+rerank chain") {
    val path = scratch("ivfpq1")
    IvfPq.build(emb, path, nlist = 8, m = 8, ksub = 16, ivfIters = 2, pqIters = 1)
    val t = GraftTable.load(spark, path)
    val combined = IvfPq.search(t, emb, qv, 10, nprobe = 8, fetch = 100)
      .as[(Long, Double)].collect().toSeq
    val purePq = Pq.topKRerank(emb, qv, 10, fetch = 100, m = 8, ksub = 16, iters = 1)
      .as[(Long, Double)].collect().toSeq
    assert(combined == purePq)
  }

  test("a reopened index searches identically to the build session's table") {
    val path = scratch("ivfpq2")
    val built = IvfPq.build(emb, path, nlist = 4, m = 8, ksub = 8,
      ivfIters = 1, pqIters = 1)
    val viaBuilt = IvfPq.search(built, emb, qv, 5, nprobe = 2, fetch = 50)
      .as[(Long, Double)].collect().toSeq
    val viaReopened = IvfPq.search(GraftTable.load(spark, path), emb, qv, 5,
      nprobe = 2, fetch = 50).as[(Long, Double)].collect().toSeq
    assert(viaBuilt == viaReopened)
  }

  test("a partial probe opens only the probed cells' code files") {
    val path = scratch("ivfpq3")
    val t = IvfPq.build(emb, path, nlist = 8, m = 8, ksub = 16,
      ivfIters = 2, pqIters = 1)
    val probed = AnnIndex.probedCells(t, qv, nprobe = 2)
    val (opened, total) = AnnIndex.probeCost(t, probed)
    assert(opened < total,
      s"2-of-8-cell probe must file-prune: opened $opened of $total")
    // and the files opened are exactly the probed cells' files
    val expected = probed.flatMap(c => t.pruneFiles(s"cell = $c")._1).distinct.size
    assert(opened == expected)
  }

  test("partial probes keep high recall against the exact top-k") {
    val path = scratch("ivfpq4")
    val t = IvfPq.build(emb, path, nlist = 8, m = 8, ksub = 16,
      ivfIters = 2, pqIters = 1)
    val exact = VectorOps.cosineTopK(emb, qv, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = IvfPq.search(t, emb, qv, 10, nprobe = 4, fetch = 100)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 at nprobe=4/8 was $recall")
  }

  test("a zero-norm query vector is rejected") {
    val path = scratch("ivfpq5")
    val t = IvfPq.build(emb, path, nlist = 4, m = 8, ksub = 8,
      ivfIters = 1, pqIters = 1)
    intercept[IllegalArgumentException] {
      IvfPq.search(t, emb, Seq.fill(qv.size)(0.0), 10, nprobe = 2, fetch = 50)
    }
  }
}
