package graft.vector

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.tables.GraftTable

/** Persisted ANN index semantics: reopen-from-storage equivalence, probe
  * file-pruning, partial-probe recall, and centroid round-tripping. */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables.t(spark, sf, "embeddings")

  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("centroid property encoding round-trips") {
    val cents = Seq((0, Seq(1.5, -2.25, 0.0)), (3, Seq(0.125, 4.0, -1.0)))
    assert(AnnIndex.decodeCentroids(AnnIndex.encodeCentroids(cents)) == cents)
  }

  test("full probe of a reopened index equals brute force") {
    val path = scratch("annidx")
    AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val reopened = GraftTable.load(spark, path)
    val viaIndex = AnnIndex.topK(reopened, qv, 10, nprobe = 8)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val exact = VectorOps.cosineTopK(emb, qv, 10)
      .as[(Long, Double)].collect().toSeq
    assert(viaIndex == exact)
  }

  test("a zero-norm query vector is rejected") {
    val path = scratch("annz")
    val t = AnnIndex.buildIvf(emb, path, nlist = 4, iters = 1)
    val dims = qv.size
    intercept[IllegalArgumentException] {
      AnnIndex.topK(t, Seq.fill(dims)(0.0), 10, nprobe = 4)
    }
  }

  test("a zero-norm data vector ranks last instead of NaN-poisoning the order") {
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(0.5f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val t = AnnIndex.buildIvf(df, scratch("annz2"), nlist = 2, iters = 1)
    val res = AnnIndex.topK(t, Seq(1.0, 0.0, 0.0, 0.0), 4, nprobe = 2)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(res.forall(r => !r._2.isNaN), s"no NaN sims allowed: ${res.toSeq}")
    assert(res.last._1 === 2L, s"the zero vector must rank last: ${res.toSeq}")
  }

  test("a partial probe opens fewer files and keeps recall") {
    val path = scratch("annidx2")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    // a 2-cell probe must be file-pruned: strictly fewer data files than
    // the table holds (cell partitioning => per-cell files)
    val probed = AnnIndex.topK(t, qv, 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val (kept, total) = AnnIndex.probeCost(t, Seq(0, 1))
    assert(kept < total, s"probe must prune files: $kept/$total")
    val exact = VectorOps.cosineTopK(emb, qv, 10)
      .select("vec_id").as[Long].collect().toSet
    assert((probed intersect exact).size >= 5,
      s"2/8-cell probe recall too low: ${(probed intersect exact).size}/10")
  }

  test("batched probe at nprobe = nlist equals the exact cosine join") {
    val path = scratch("annbatch1")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val batch = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val viaIndex = AnnIndex.probePairs(t, batch, threshold = 0.5, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    // exact: brute-force batch x corpus cosine with identical rounding
    val b = batch.select(col("vec_id").as("id1"),
      transform(col("embedding"), x => x.cast("double")).as("bv"))
    val e = emb.select(col("vec_id").as("id2"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
    val den = VectorOps.normPre(col("bv")) * VectorOps.normPre(col("ev"))
    val exact = b.crossJoin(e)
      .select(col("id1"), col("id2"),
        round(when(den > 0, VectorOps.dotPre(col("bv"), col("ev")) / den)
          .otherwise(lit(-1.0)) + lit(1e-9), 4).as("sim"))
      .filter(col("sim") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex == exact)
    assert(viaIndex.nonEmpty, "batch copies must at least match their source at 1.0")
  }

  test("batched probe at nprobe = 1 file-prunes to the probed cells") {
    val path = scratch("annbatch2")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    // single-vector batch: one probed cell, strictly fewer files than total
    val one = emb.filter(col("vec_id") === 0)
    val pairs = AnnIndex.probePairs(t, one, threshold = 0.5, nprobe = 1)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (id1, id2, sim) => id1 == 0L && id2 == 0L && sim == 1.0 },
      s"self-match must survive a 1-cell probe: ${pairs.take(5).toSeq}")
    val (kept, total) = AnnIndex.probeCost(t, AnnIndex.probedCells(t, qv, 1))
    assert(kept < total, s"1-cell probe must prune files: $kept/$total")
  }

  test("batched probe rejects a non-positive threshold") {
    val path = scratch("annbatch3")
    val t = AnnIndex.buildIvf(emb, path, nlist = 4, iters = 1)
    intercept[IllegalArgumentException] {
      AnnIndex.probePairs(t, emb.limit(3), threshold = 0.0, nprobe = 2)
    }
  }

  test("append assigns each new vector to its nearest existing cell") {
    val path = scratch("annapp")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val newVecs = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 7000).as("vec_id"), col("embedding"))
    AnnIndex.append(t, newVecs)
    // each appended copy must land in the SAME cell as its source — the
    // source was assigned to its nearest centroid at build time, and the
    // append uses identical arithmetic over identical centroids
    val cells = t.read().select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(cells(id + 7000) == cells(id),
        s"copy of $id landed in ${cells(id + 7000)}, source in ${cells(id)}")
    }
  }

  test("append is idempotent under micro-batch replay") {
    val path = scratch("annapp3")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val before = t.read().count()
    val batch = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"), col("embedding"))
    AnnIndex.append(t, batch)
    val after = t.read().count()
    assert(after == before + 10)
    // a retried micro-batch re-delivers the same rows — nothing may land
    AnnIndex.append(t, batch)
    assert(t.read().count() == after, "replayed batch must not double-insert")
    // and a half-overlapping batch lands only its new half
    val half = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 5000).as("vec_id"), col("embedding"))
    AnnIndex.append(t, half)
    assert(t.read().count() == after + 10)
  }

  test("appended vectors are probe-able after a cold reopen, corpus unchanged") {
    val path = scratch("annapp2")
    val t = AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val before = t.read().count()
    val novel = Seq((9001L, Array.fill(64)(0.0f).updated(0, 1.0f).toSeq))
      .toDF("vec_id", "embedding")
    AnnIndex.append(t, novel)
    val reopened = GraftTable.load(spark, path)
    assert(reopened.read().count() == before + 1)
    // the appended vector's own probe must find it at sim 1.0
    val hits = AnnIndex.probePairs(reopened,
        novel.select((col("vec_id") + 1).as("vec_id"), col("embedding")),
        threshold = 0.95, nprobe = 2)
      .as[(Long, Long, Double)].collect()
    assert(hits.exists { case (_, id2, sim) => id2 == 9001L && sim == 1.0 },
      s"appended vector must self-match on reprobe: ${hits.toSeq}")
    // append must not rewrite existing data files
    assert(AnnIndex.topK(reopened, qv, 5, nprobe = 8)
      .filter(col("vec_id") < 9000).count() == 5)
  }
}
