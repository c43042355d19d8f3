package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vector.VectorOps

/** Similarity search over the `embeddings` table (north-star scope):
  * brute-force cosine top-k (exact baseline), LSH-bucketed ANN (scale
  * path, rows-only check — recall is asserted in ScalaTest against the
  * exact baseline), and blocked near-dup pair mining.
  */
object VectorQueries extends QueryBatch {

  private def emb(s: SparkSession, dir: String) = Tables.t(s, dir, "embeddings")

  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    emb(s, dir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  private val cosineSql =
    """list_sum(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))
       / (sqrt(list_sum(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))
        * sqrt(list_sum(list_transform(range(64), i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))))"""

  /** Exact brute-force cosine top-k against the vec_id=0 query vector. */
  private val q80 = GQ(
    "q80_cosine_topk",
    (s, dir) => VectorOps.cosineTopK(emb(s, dir), queryVec(s, dir), 10),
    Some(s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
             SELECT e.vec_id, round($cosineSql + 1e-9, 4) AS sim
             FROM embeddings e, q
             ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  /** Within-label all-pairs near-dup mining, exact, with bounded task
    * size: labels larger than the block size are split triangle-wise so a
    * hot label spreads its inherently quadratic block across the cluster
    * instead of one task (VectorOps.exactPairsWithinKey). blockSize=200
    * exercises the splitting at gate scale; at 100 TB it would be sized
    * to executor memory. */
  private val q81 = GQ(
    "q81_embedding_near_dup",
    (s, dir) =>
      VectorOps.exactPairsWithinKey(emb(s, dir), "label", 0.35, blockSize = 200,
          dotFn = (a, b) => graft.functions.DotProduct.dot_product(s, a, b))
        .orderBy("id1", "id2"),
    Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
            round(list_sum(list_transform(range(64),
                    i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
              / (sqrt(list_sum(list_transform(range(64),
                    i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(64),
                    i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))) + 1e-9, 4) AS sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_sum(list_transform(range(64),
                    i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
              / (sqrt(list_sum(list_transform(range(64),
                    i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(64),
                    i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))) + 1e-9, 4) >= 0.35
            ORDER BY id1, id2""")
  )

  /** LSH-bucketed approximate top-k (scale path). Rows-only gate check —
    * approximate recall vs the exact baseline is asserted in
    * VectorOpsSpec, not hash-compared. */
  private val q82 = GQ(
    "q82_lsh_topk",
    (s, dir) => VectorOps.lshTopK(emb(s, dir), queryVec(s, dir), 10, nPlanes = 8),
    None
  )

  /** IVF-probed approximate top-k (k-means coarse quantizer, FAISS-style
    * scale path). With nprobe = nlist the result is exactly brute force —
    * which is what this gate query runs, so it hash-matches the q80
    * oracle; sub-linear probing (`nprobe < nlist`) is asserted on planted
    * neighbors in IvfSpec. */
  private val q83 = GQ(
    "q83_ivf_topk",
    (s, dir) => graft.vector.Ivf.topK(
        emb(s, dir), queryVec(s, dir), 10, nlist = 8, nprobe = 8, iters = 2)
      .select("vec_id", "sim"),
    Some(s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
             SELECT e.vec_id, round($cosineSql + 1e-9, 4) AS sim
             FROM embeddings e, q
             ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  override def queries: Seq[GQ] = Seq(q80, q81, q82, q83)
}
