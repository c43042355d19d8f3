package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprColumn

import graft.functions.{DotProd, NormL2, VecLit}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine is the exact baseline (O(N·d) per query — one pass,
  * no shuffle, codegen'd arithmetic via `zip_with`/`aggregate`, no UDF).
  * The scale path is sign-LSH bucketing: deterministic pseudo-random
  * hyperplanes hash each vector to a bucket; queries probe only matching
  * buckets, turning 100 TB scans into bucket-sized reads.
  */
object VectorOps {

  /** Sequential dot product in double precision (deterministic order —
    * reproducible across engines). Codegen kernel — the HOF
    * `aggregate(zip_with(...))` form evaluates an interpreted lambda per
    * element (guide §4); VecNativeSpec pins bit-equality. */
  def dot(a: Column, b: Column): Column =
    ExprColumn.column(DotProd(ExprColumn.expression(a), ExprColumn.expression(b)))

  def norm(a: Column): Column =
    ExprColumn.column(NormL2(ExprColumn.expression(a)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized double vector — compute once per row, then cosine of
    * two normalized vectors is a bare dot product. */
  def normalized(a: Column): Column = {
    val d = transform(a, x => x.cast("double"))
    transform(d, x => x / norm(d))
  }

  /** Dot product of already-double arrays (same kernel — it casts only
    * float elements, exactly). */
  def dotPre(a: Column, b: Column): Column = dot(a, b)

  /** Norm of an already-double array. */
  def normPre(a: Column): Column = norm(a)

  /** Symmetric int8 scalar quantization stats per vector: per-vector scale
    * `max|v| / 127`, reconstruction MSE and max absolute error of
    * `round(v/scale)*scale`. The storage-scale path for ANN at 100 TB —
    * int8 cuts embedding bytes 4× before IVF/LSH bucketing — and a pure
    * codegen'd projection (higher-order functions, no UDF, no shuffle):
    * quantization quality is audited in the same scan that would write the
    * quantized copy. Deterministic: sequential double arithmetic in array
    * order, identical in any engine. */
  def int8QuantStats(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    emb
      .withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("__scale",
        greatest(aggregate(col("__v"), lit(0.0), (a, x) => greatest(a, abs(x))),
          lit(1e-30)) / 127)
      .withColumn("__err", transform(col("__v"),
        x => x - round(x / col("__scale")) * col("__scale")))
      .select(col(idCol),
        round(col("__scale") + lit(1e-12), 8).as("scale"),
        round(aggregate(col("__err"), lit(0.0), (a, x) => a + x * x)
          / size(col("__v")) + lit(1e-12), 8).as("mse"),
        round(aggregate(col("__err"), lit(0.0), (a, x) => greatest(a, abs(x)))
          + lit(1e-12), 8).as("max_err"))
  }

  /** Guarded cosine column: zero-norm data vectors score the −1 sentinel
    * (an unguarded division emits NaN, which Spark sorts FIRST under
    * desc and which passes every `>=` floor) — the same rule
    * `AnnIndex.topK`/`probePairs` apply. */
  private def guardedSim(vecCol: Column, q: Column): Column = {
    val vn = norm(vecCol)
    round(when(vn > 0, dot(vecCol, q) / (vn * norm(q)))
      .otherwise(lit(-1.0)) + lit(1e-9), 4)
  }

  /** Exact top-k by cosine against one query vector. Plans as a single
    * scan + TakeOrderedAndProject — no shuffle of the embedding column.
    * Zero-norm data vectors rank last via the −1 sentinel. */
  def cosineTopK(emb: DataFrame, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queryVec.exists(_ != 0.0), "query vector must have non-zero norm")
    val q = VecLit.doubles(queryVec)
    emb.select(col(idCol), guardedSim(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All vectors within a cosine radius of one query — the range-search
    * dual of [[cosineTopK]] (dedup-threshold sweeps and "everything about
    * this topic" pulls want a similarity floor, not a count). Single scan,
    * codegen'd higher-order-function cosine, filter on the ROUNDED score
    * so the cut is engine-replayable; no shuffle, no collect. At 100 TB
    * compose with the persisted IVF index: probe the cells whose centroid
    * similarity clears the floor minus a slack and run this filter over
    * the file-pruned read (RangeSearchSpec pins pruned ⊆ brute and
    * recall on the probed cells). */
  def rangeSearch(emb: DataFrame, queryVec: Seq[Double], minSim: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queryVec.exists(_ != 0.0), "query vector must have non-zero norm")
    require(minSim > -1.0, s"minSim must exceed the -1 zero-norm sentinel, got $minSim")
    val q = VecLit.doubles(queryVec)
    emb.select(col(idCol), guardedSim(col(vecCol), q).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Deterministic ±1 hyperplane component for plane p, dimension i
    * (splitmix-style integer mix — no RNG state, safe to inline in SQL). */
  private def planeSign(p: Int, i: Column): Column = {
    val h = xxhash64(lit(p), i)
    when(h.bitwiseAND(lit(1L)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Sign-LSH bucket id from `nPlanes` pseudo-random ±1 hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeSign(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k: probe only vectors in the query's LSH bucket (and
    * optionally hamming-1 neighbor buckets), exact-rerank inside. Returns
    * (vec_id, sim, bucket). Recall/latency tradeoff via nPlanes.
    *
    * Caveat: sign-LSH recall is only meaningful when neighbors are
    * angularly close (near-dups, cosine ≳ 0.7). On isotropic random data
    * the true top-k sit near 90° of the query and bucketing carries no
    * signal — use `cosineTopK` there. VectorOpsSpec asserts recall on
    * planted near-duplicates, the honest use case. */
  def lshTopK(emb: DataFrame, queryVec: Seq[Double], k: Int, nPlanes: Int = 8,
      probeNeighbors: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = VecLit.doubles(queryVec)
    val qBucketRow = emb.sparkSession.range(1)
      .select(lshBucket(q, nPlanes).as("qb")).head()
    val qBucket = qBucketRow.getLong(0)
    val probes: Seq[Long] =
      if (!probeNeighbors) Seq(qBucket)
      else qBucket +: (0 until nPlanes).map(p => qBucket ^ (1L << p))
    emb.withColumn("bucket", lshBucket(col(vecCol), nPlanes))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q) + lit(1e-9), 4).as("sim"),
        col("bucket"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact within-key all-pairs at cosine ≥ threshold, with *bounded task
    * size*. An exact similarity join under a grouping key is inherently
    * Θ(Σ m_key²); the scale hazard is not the total work but a hot key
    * landing its whole m² block on one task (straggler/OOM). Keys larger
    * than `blockSize` are split into G = ⌈m/blockSize⌉ sub-groups and
    * joined triangle-wise: each row is replicated to the G cells
    * (min(g,k), max(g,k)), every pair meets in exactly one cell, and no
    * cell exceeds ~(2·blockSize)² comparisons — the quadratic work
    * spreads evenly across the cluster. Use the LSH/IVF variants when
    * approximate recall is acceptable; this is the exact path.
    *
    * `dotFn` computes similarity of two unit vectors (defaults to the
    * codegen-friendly fold; callers can pass a native Expression). */
  def exactPairsWithinKey(emb: DataFrame, keyCol: String, threshold: Double,
      blockSize: Int = 4096, idCol: String = "vec_id", vecCol: String = "embedding",
      dotFn: (Column, Column) => Column = dotPre): DataFrame = {
    val sizes = emb.groupBy(keyCol).agg(count(lit(1)).as("__m"))
    // normalize once per vector; the lineage cut truncates the plan so
    // Catalyst cannot inline the normalization into the per-pair projection
    val withG = graft.perf.Lineage.cut(emb.join(sizes, keyCol)
      .withColumn("__nblk", ceil(col("__m") / lit(blockSize)).cast("int"))
      .withColumn("__blk", pmod(xxhash64(col(idCol)), col("__nblk")).cast("int"))
      .select(col(keyCol), col(idCol), normalized(col(vecCol)).as("__v"),
        col("__nblk"), col("__blk")))
    val cells = withG.withColumn("__cell",
        explode(transform(sequence(lit(0), col("__nblk") - 1),
          k => struct(least(col("__blk"), k).as("i"), greatest(col("__blk"), k).as("j")))))
      .select(col(keyCol), col(idCol), col("__v"), col("__blk"),
        col("__cell.i").as("__i"), col("__cell.j").as("__j"))
    cells.alias("a")
      .join(cells.alias("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col("a.__i") === col("b.__i") && col("a.__j") === col("b.__j") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          // same-group pairs share all G cells; count them only on the
          // diagonal (different-group pairs meet in exactly one cell)
          (col("a.__blk") =!= col("b.__blk") ||
            (col("a.__i") === col("a.__blk") && col("a.__j") === col("a.__blk"))))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        round(dotFn(col("a.__v"), col("b.__v")) + lit(1e-9), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** All-pairs near-duplicates by embedding cosine ≥ threshold, LSH-blocked:
    * only same-bucket pairs are compared (plus the caller can lower nPlanes
    * to raise recall). Never materializes the full N² product. */
  def nearDupPairs(emb: DataFrame, threshold: Double, nPlanes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withB = emb.withColumn("bucket", lshBucket(col(vecCol), nPlanes))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket"))
    withB.alias("a")
      .join(withB.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(cosine(col("a.v"), col("b.v")) + lit(1e-9), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
