package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * reproducible across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized double vector — compute once per row, then cosine of
    * two normalized vectors is a bare dot product. */
  def normalized(a: Column): Column = {
    val d = transform(a, x => x.cast("double"))
    val n = sqrt(aggregate(transform(d, x => x * x), lit(0.0), (acc, v) => acc + v))
    transform(d, x => x / n)
  }

  /** Dot product of already-double arrays (no per-element casts). */
  def dotPre(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Norm of an already-double array. */
  def normPre(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Exact top-k by cosine against one query vector. Plans as a single
    * scan + TakeOrderedAndProject — no shuffle of the embedding column. */
  def cosineTopK(emb: DataFrame, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    emb.select(col(idCol),
        round(cosine(col(vecCol), q) + lit(1e-9), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
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
    val q = array(queryVec.map(lit): _*)
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
