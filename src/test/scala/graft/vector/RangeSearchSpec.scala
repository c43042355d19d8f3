package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Cosine range search: brute-scan semantics (the q239 gate's oracle
  * replays the arithmetic) and the IVF cell-pruned scale path —
  * containment in brute at any nprobe, exact equivalence at full probe,
  * and genuine file pruning. */
class RangeSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables.t(spark, sf, "embeddings")

  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("pruned range search is contained in brute and exact at full probe") {
    val path = scratch("rangeidx")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val brute = VectorOps.rangeSearch(emb, qv, 0.2)
      .as[(Long, Double)].collect().toMap
    val full = AnnIndex.rangeSearch(t, qv, 0.2, nprobe = 8)
      .as[(Long, Double)].collect().toMap
    assert(full == brute, "full probe must equal the brute scan")
    val pruned = AnnIndex.rangeSearch(t, qv, 0.2, nprobe = 2)
      .as[(Long, Double)].collect().toMap
    assert(pruned.toSet.subsetOf(brute.toSet),
      "a partial probe must never invent results")
    // the query's own cell is always probed first → self-match survives
    assert(pruned.get(0L).contains(1.0))
  }

  test("range probe opens fewer files than the table holds") {
    val path = scratch("rangeidx2")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val (kept, total) = AnnIndex.probeCost(t, AnnIndex.probedCells(t, qv, 2))
    assert(kept < total, s"2-cell range probe must prune files: $kept/$total")
  }

  test("the -1 zero-norm sentinel cannot leak through the floor") {
    val path = scratch("rangeidx3")
    val withZero = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((8999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val t = AnnIndex.buildIvf(withZero, path, nlist = 4, iters = 1)
    intercept[IllegalArgumentException] {
      AnnIndex.rangeSearch(t, qv, minSim = -1.0, nprobe = 4)
    }
    val res = AnnIndex.rangeSearch(t, qv, minSim = 0.0, nprobe = 4)
      .filter(col("vec_id") === 8999L)
    assert(res.isEmpty, "a zero-norm vector must never clear a positive floor")
  }

  test("brute range search and top-k apply the same sentinel — NaN never surfaces") {
    val withZero = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((8999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    // NaN compares greater than everything in Spark: unguarded cosine
    // would pass any floor and sort FIRST in top-k
    val ranged = VectorOps.rangeSearch(withZero, qv, 0.0)
    assert(ranged.filter(col("vec_id") === 8999L).isEmpty,
      "zero-norm vector cleared the brute floor")
    val top = VectorOps.cosineTopK(withZero, qv, 3)
      .select("vec_id").as[Long].collect()
    assert(!top.contains(8999L), s"zero-norm vector surfaced in top-k: ${top.toSeq}")
    intercept[IllegalArgumentException] {
      VectorOps.rangeSearch(emb, Seq.fill(64)(0.0), 0.5)
    }
    // MMR: zero-norm candidates are dropped pre-take, never crash r4
    val picks = Mmr.rerank(withZero, qv, nCand = 10, k = 3)
      .select("vec_id").as[Long].collect()
    assert(picks.length == 3 && !picks.contains(8999L))
  }
}
