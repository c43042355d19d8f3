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

  /** LSH-bucketed approximate top-k (scale path). The sign-hyperplane
    * matrix is 8×64 data-independent constants (xxhash64 parity bits), so
    * the oracle inlines it as bitstrings and replays bucketing, neighbor
    * probing, and the exact rerank in SQL. Recall vs the exact baseline
    * is additionally asserted in VectorOpsSpec. */
  private val q82 = GQ(
    "q82_lsh_topk",
    (s, dir) => VectorOps.lshTopK(emb(s, dir), queryVec(s, dir), 10, nPlanes = 8),
    Some("""WITH planes(ps) AS (SELECT [
              '0111100100110110000010010101010000011001101101011100110000100111',
              '1010110111001101100011110101101101100110000001100000010000010011',
              '1001100010011111011010100000100011110011010110111000101111010010',
              '1011110101011001111010111010110010011001111101001110001001111001',
              '0011101011110101011000100101101010100000000011110111000101110011',
              '0001000111100001111000110110110100011110100011010100011110101001',
              '0111001001011111000000010100011100111100110111101000110111101011',
              '0101000010101011100101101000101001111000011000100011101111000001']),
            vb AS (
              SELECT e.vec_id, e.embedding,
                CAST(list_sum(list_transform(range(8), p ->
                  CASE WHEN list_sum(list_transform(range(64), i ->
                        e.embedding[i+1]::DOUBLE *
                        (CASE WHEN substr(ps[CAST(p+1 AS INTEGER)], CAST(i+1 AS INTEGER), 1) = '1'
                              THEN 1.0 ELSE -1.0 END))) > 0
                    THEN 1 << p ELSE 0 END)) AS BIGINT) AS bucket
              FROM embeddings e, planes),
            q AS (SELECT embedding, bucket AS qb FROM vb WHERE vec_id = 0)
            SELECT v.vec_id,
              round(list_sum(list_transform(range(64), i -> v.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))
                / (sqrt(list_sum(list_transform(range(64), i -> v.embedding[i+1]::DOUBLE * v.embedding[i+1]::DOUBLE)))
                 * sqrt(list_sum(list_transform(range(64), i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))))
                + 1e-9, 4) AS sim,
              v.bucket
            FROM vb v, q
            WHERE v.bucket = q.qb
               OR xor(v.bucket, q.qb) IN (1, 2, 4, 8, 16, 32, 64, 128)
            ORDER BY sim DESC, vec_id LIMIT 10""")
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

  /** Int8 scalar-quantization audit: per-vector scale + reconstruction
    * error of the 4×-smaller int8 copy (VectorOps.int8QuantStats — pure
    * scan projection; the storage path ANN rides at 100 TB). Oracle
    * replays the identical sequential double arithmetic with DuckDB list
    * lambdas. */
  private val q84 = GQ(
    "q84_int8_quantization",
    (s, dir) => VectorOps.int8QuantStats(emb(s, dir)).orderBy("vec_id"),
    Some("""WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
                 s AS (SELECT vec_id, v,
                         greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
                           / 127 AS scale
                       FROM v),
                 d AS (SELECT vec_id, scale,
                         list_transform(v, x -> x - round(x / scale) * scale) AS e,
                         len(v) AS n
                       FROM s)
            SELECT vec_id,
                   round(scale + 1e-12, 8) AS scale,
                   round(list_sum(list_transform(e, x -> x * x)) / n + 1e-12, 8)
                     AS mse,
                   round(list_max(list_transform(e, x -> abs(x))) + 1e-12, 8)
                     AS max_err
            FROM d ORDER BY vec_id""")
  )

  /** Product-quantization ADC top-k (`Pq.adcTopK`, m=8 subspaces × 16
    * codes, one Lloyd round): vectors compress 64×4 bytes → 8 bytes and
    * queries score code words via an m×ksub lookup table. The oracle
    * replays the ENTIRE deterministic pipeline in SQL — lowest-id init,
    * tie-to-lowest-cell Lloyd assignment, 1e-6-rounded centroid
    * recompute, re-encode, ADC reconstruction cosine — so the gate checks
    * training, encoding, and scoring, not just the final ordering. */
  private val q208 = GQ(
    "q208_pq_adc_topk",
    (s, dir) => graft.vector.Pq.adcTopK(
      emb(s, dir), queryVec(s, dir), 10, m = 8, ksub = 16, iters = 1),
    Some("""WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
                 subs AS (SELECT vec_id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS sv
                          FROM v, UNNEST(range(8)) AS s(sub)),
                 init AS (SELECT sub,
                            row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS cell,
                            sv AS c
                          FROM subs
                          QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= 16),
                 d1 AS (SELECT p.vec_id, p.sub, i.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - i.c[j+1]) * (p.sv[j+1] - i.c[j+1]))), i.cell) AS rn
                        FROM subs p JOIN init i USING (sub)),
                 asg AS (SELECT vec_id, sub, cell FROM d1 WHERE rn = 1),
                 cdim AS (SELECT a.sub, a.cell, d.dim,
                            round(avg(p.sv[d.dim+1]) + 1e-9, 6) AS mval
                          FROM asg a JOIN subs p USING (vec_id, sub),
                               UNNEST(range(8)) AS d(dim)
                          GROUP BY a.sub, a.cell, d.dim),
                 cent AS (SELECT sub, cell, list(mval ORDER BY dim) AS c
                          FROM cdim GROUP BY sub, cell),
                 d2 AS (SELECT p.vec_id, p.sub, c.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - c.c[j+1]) * (p.sv[j+1] - c.c[j+1]))), c.cell) AS rn
                        FROM subs p JOIN cent c USING (sub)),
                 codes AS (SELECT vec_id, sub, cell FROM d2 WHERE rn = 1),
                 q AS (SELECT sub, sv AS qv FROM subs WHERE vec_id = 0),
                 qn AS (SELECT sqrt(sum(list_sum(list_transform(qv, x -> x * x)))) AS qnorm
                        FROM q),
                 scored AS (SELECT co.vec_id,
                              sum(list_sum(list_transform(range(8),
                                j -> q.qv[j+1] * ce.c[j+1]))) AS dots,
                              sum(list_sum(list_transform(ce.c, x -> x * x))) AS n2
                            FROM codes co
                            JOIN cent ce USING (sub, cell)
                            JOIN q USING (sub)
                            GROUP BY co.vec_id)
            SELECT s.vec_id, round(s.dots / (qn.qnorm * sqrt(s.n2)) + 1e-9, 4) AS sim
            FROM scored s, qn
            ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  /** Persisted ANN index (`AnnIndex`): IVF assignment materialized as a
    * cell-partitioned GraftTable with centroids in TBLPROPERTIES — the
    * query path REOPENS the table from storage (no in-memory state from
    * the build) and probes via per-cell file-pruned reads. nprobe =
    * nlist makes the probe exact, so the oracle is brute-force cosine
    * (the q83 gate idiom); partial-probe recall and file-pruning ratios
    * are spec-asserted (AnnIndexSpec). */
  private val q211 = GQ(
    "q211_ann_index_table",
    (s, dir) => {
      val path = Scratch.dir("annidx")
      graft.vector.AnnIndex.buildIvf(emb(s, dir), path, nlist = 8, iters = 2)
      val reopened = graft.tables.GraftTable.load(s, path)
      graft.vector.AnnIndex.topK(reopened, queryVec(s, dir), 10, nprobe = 8)
        .select("vec_id", "sim")
    },
    Some(s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
             SELECT e.vec_id, round($cosineSql + 1e-9, 4) AS sim
             FROM embeddings e, q
             ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  /** Full SQL replay of the deterministic PQ train → encode → ADC
    * 100-id shortlist → exact-rerank chain at m=8, ksub=16, iters=1,
    * k=10 — shared verbatim by q214 (PQ index alone) and q215 (IVF+PQ:
    * with nprobe = nlist the cell probe covers every code file, so the
    * combined search degenerates to exactly this chain and any
    * partition-routing or code-persistence bug hash-mismatches). */
  private val pqRerankSql = s"""WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
                 subs AS (SELECT vec_id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS sv
                          FROM v, UNNEST(range(8)) AS s(sub)),
                 init AS (SELECT sub,
                            row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS cell,
                            sv AS c
                          FROM subs
                          QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= 16),
                 d1 AS (SELECT p.vec_id, p.sub, i.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - i.c[j+1]) * (p.sv[j+1] - i.c[j+1]))), i.cell) AS rn
                        FROM subs p JOIN init i USING (sub)),
                 asg AS (SELECT vec_id, sub, cell FROM d1 WHERE rn = 1),
                 cdim AS (SELECT a.sub, a.cell, d.dim,
                            round(avg(p.sv[d.dim+1]) + 1e-9, 6) AS mval
                          FROM asg a JOIN subs p USING (vec_id, sub),
                               UNNEST(range(8)) AS d(dim)
                          GROUP BY a.sub, a.cell, d.dim),
                 cent AS (SELECT sub, cell, list(mval ORDER BY dim) AS c
                          FROM cdim GROUP BY sub, cell),
                 d2 AS (SELECT p.vec_id, p.sub, c.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - c.c[j+1]) * (p.sv[j+1] - c.c[j+1]))), c.cell) AS rn
                        FROM subs p JOIN cent c USING (sub)),
                 codes AS (SELECT vec_id, sub, cell FROM d2 WHERE rn = 1),
                 qs AS (SELECT sub, sv AS qv FROM subs WHERE vec_id = 0),
                 qsn AS (SELECT sqrt(sum(list_sum(list_transform(qv, x -> x * x)))) AS qnorm
                         FROM qs),
                 scored AS (SELECT co.vec_id,
                              sum(list_sum(list_transform(range(8),
                                j -> qs.qv[j+1] * ce.c[j+1]))) AS dots,
                              sum(list_sum(list_transform(ce.c, x -> x * x))) AS n2
                            FROM codes co
                            JOIN cent ce USING (sub, cell)
                            JOIN qs USING (sub)
                            GROUP BY co.vec_id),
                 short AS (SELECT s.vec_id FROM scored s, qsn
                           ORDER BY round(s.dots / (qsn.qnorm * sqrt(s.n2)) + 1e-9, 4) DESC, s.vec_id
                           LIMIT 100),
                 q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id, round($cosineSql + 1e-9, 4) AS sim
            FROM embeddings e JOIN short USING (vec_id), q
            ORDER BY sim DESC, vec_id LIMIT 10"""

  /** Persisted PQ index (`PqIndex`): code words as a GraftTable with the
    * codebooks in TBLPROPERTIES — the query path REOPENS the table (no
    * in-memory training state), ADC-shortlists 100 ids from the persisted
    * codes, and exact-reranks only those vectors. The oracle replays the
    * ENTIRE pipeline in SQL — q208's deterministic training/encode/ADC
    * chain, the 100-id shortlist at the same rounded ordering, then the
    * exact cosine rerank — so a codebook that mis-round-trips through
    * table properties, or codes that differ from in-session encoding,
    * hash-mismatch immediately. */
  private val q214 = GQ(
    "q214_pq_index_table",
    (s, dir) => {
      val path = Scratch.dir("pqidx")
      graft.vector.PqIndex.build(emb(s, dir), path, m = 8, ksub = 16, iters = 1)
      val reopened = graft.tables.GraftTable.load(s, path)
      graft.vector.PqIndex.topKRerank(
        reopened, emb(s, dir), queryVec(s, dir), 10, fetch = 100)
    },
    Some(pqRerankSql)
  )

  /** Combined IVF+PQ persisted index (`IvfPq`): cell-partitioned code
    * files + both quantizers' metadata in TBLPROPERTIES, reopened from
    * storage and searched probe → ADC shortlist → exact rerank. The gate
    * probes every cell (nprobe = nlist), which must reproduce the pure-PQ
    * chain bit-for-bit; partial-probe file pruning and recall are
    * spec-asserted (IvfPqSpec). */
  private val q215 = GQ(
    "q215_ivfpq_index_table",
    (s, dir) => {
      val path = Scratch.dir("ivfpqidx")
      graft.vector.IvfPq.build(emb(s, dir), path, nlist = 8, m = 8,
        ksub = 16, ivfIters = 2, pqIters = 1)
      val reopened = graft.tables.GraftTable.load(s, path)
      graft.vector.IvfPq.search(
        reopened, emb(s, dir), queryVec(s, dir), 10, nprobe = 8, fetch = 100)
    },
    Some(pqRerankSql)
  )

  /** Batched ANN search / incremental embedding dedup (`AnnIndex
    * .probePairs`): a whole ingest batch (every 25th vector, re-ided)
    * probes the REOPENED persisted IVF index in one distributed job —
    * per-vector probe cells in-plan from the PROPERTIES centroids, the
    * index read file-pruned to the probed-cell union, pairs from a
    * cell-keyed join. The gate probes every cell (nprobe = nlist), so
    * the oracle is the exact batch × corpus cosine join; partial-probe
    * pruning and recall are spec-asserted (AnnIndexSpec). */
  private val q217 = GQ(
    "q217_ann_batch_probe",
    (s, dir) => {
      val path = Scratch.dir("annbatch")
      graft.vector.AnnIndex.buildIvf(emb(s, dir), path, nlist = 8, iters = 2)
      val reopened = graft.tables.GraftTable.load(s, path)
      val batch = emb(s, dir).filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      graft.vector.AnnIndex.probePairs(reopened, batch, threshold = 0.5, nprobe = 8)
        .orderBy("id1", "id2")
    },
    Some("""SELECT b.vec_id + 100000 AS id1, e.vec_id AS id2,
                   round(list_sum(list_transform(range(64),
                           i -> b.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE))
                     / (sqrt(list_sum(list_transform(range(64),
                           i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))
                      * sqrt(list_sum(list_transform(range(64),
                           i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))) + 1e-9, 4) AS sim
            FROM embeddings b JOIN embeddings e
              ON b.vec_id % 25 = 0
            WHERE round(list_sum(list_transform(range(64),
                           i -> b.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE))
                     / (sqrt(list_sum(list_transform(range(64),
                           i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))
                      * sqrt(list_sum(list_transform(range(64),
                           i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))) + 1e-9, 4) >= 0.5
            ORDER BY id1, id2""")
  )

  /** Semantic dedup end-to-end: the exact embedding near-dup pairs (q81's
    * operator) resolved into clusters with the O(log n) connected
    * components of the text family — keep-lowest-id per cluster, the full
    * embedding-based dedup pipeline a training corpus runs. Oracle =
    * pair SQL + recursive-CTE reachability (q202 idiom). */
  private val q213 = GQ(
    "q213_embedding_clusters",
    (s, dir) => {
      val e = emb(s, dir)
      val pairs = VectorOps.exactPairsWithinKey(e, "label", 0.35, blockSize = 200,
          dotFn = (a, b) => graft.functions.DotProduct.dot_product(s, a, b))
        .select(col("id1").as("d1"), col("id2").as("d2"))
      graft.text.DedupOps.connectedComponents(
          pairs, e.select(col("vec_id").as("doc_id")))
        .select(col("doc_id").as("vec_id"), col("cluster_rep"),
          (col("cluster_rep") =!= col("doc_id")).as("is_dup"))
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE
              p AS (SELECT a.vec_id AS d1, b.vec_id AS d2
                    FROM embeddings a JOIN embeddings b
                      ON a.label = b.label AND a.vec_id < b.vec_id
                    WHERE round(list_sum(list_transform(range(64),
                            i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
                      / (sqrt(list_sum(list_transform(range(64),
                            i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
                       * sqrt(list_sum(list_transform(range(64),
                            i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))) + 1e-9, 4) >= 0.35),
              edges AS (SELECT d1 AS u, d2 AS v FROM p
                        UNION ALL SELECT d2, d1 FROM p),
              reach(a, b) AS (SELECT u, v FROM edges
                              UNION
                              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u)
             SELECT em.vec_id,
                    least(em.vec_id, coalesce(min(r.b), em.vec_id)) AS cluster_rep,
                    least(em.vec_id, coalesce(min(r.b), em.vec_id)) <> em.vec_id AS is_dup
             FROM embeddings em LEFT JOIN reach r ON r.a = em.vec_id
             GROUP BY em.vec_id ORDER BY em.vec_id""")
  )

  /** One nearest-centroid assignment round in SQL: every vector ranked
    * against every centroid in `cTbl` by (-cosine, cell) — the exact
    * [[graft.vector.Ivf.assign]] semantics including the zero-norm → 0
    * (orthogonal) convention — keeping rank 1. */
  private def assignSql(cTbl: String, out: String): String =
    s"""$out AS (SELECT asg.vec_id, asg.cell FROM (
          SELECT v.vec_id, c.cell,
            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              CASE WHEN sqrt(list_sum(list_transform(v.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(c.c, x -> x * x))) > 0
                   THEN -(list_sum(list_transform(range(64), j -> v.v[j+1] * c.c[j+1]))
                          / (sqrt(list_sum(list_transform(v.v, x -> x * x)))
                           * sqrt(list_sum(list_transform(c.c, x -> x * x)))))
                   ELSE 0.0 END, c.cell) AS rn
          FROM v CROSS JOIN $cTbl c) asg WHERE asg.rn = 1)"""

  /** One Lloyd recompute round in SQL: per-(cell, dim) mean snapped to
    * the 6-decimal grid — the `roundCentroidsTo = Some(6)` convention
    * that makes Spark's and DuckDB's partial-sum orders agree. */
  private def recomputeSql(asg: String, out: String): String =
    s"""$out AS (SELECT cell, list(m ORDER BY dim) AS c FROM (
          SELECT a.cell, d.dim, round(avg(v.v[d.dim + 1]) + 1e-9, 6) AS m
          FROM $asg a JOIN v USING (vec_id), UNNEST(range(64)) AS d(dim)
          GROUP BY a.cell, d.dim) means GROUP BY cell)"""

  /** Cluster-balanced diversity sampling (`ClusterSample
    * .clusterBalancedSample`): k-means cells cap every semantic
    * neighborhood at ceil(fraction · cell_size) most-central
    * representatives — the SemDeDup-style curation step. The oracle
    * replays the ENTIRE pipeline in SQL: deterministic k-means (lowest-8
    * init, two cosine-assignment/recompute rounds on the 6-decimal
    * centroid grid), final assignment, centrality ranking, per-cell
    * quota — so a drifted centroid, a flipped cell membership, or a
    * mis-ranked representative hash-mismatches. */
  private val q220 = GQ(
    "q220_cluster_sample",
    (s, dir) => graft.vector.ClusterSample.clusterBalancedSample(
        emb(s, dir), k = 8, fraction = 0.2, iters = 2)
      .orderBy("cell", "rank_in_cell"),
    Some(s"""WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                        FROM embeddings),
                 init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
                            v AS c
                          FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 8),
                 ${assignSql("init", "g0")},
                 ${recomputeSql("g0", "c1")},
                 ${assignSql("c1", "g1")},
                 ${recomputeSql("g1", "c2")},
                 ${assignSql("c2", "g2")},
                 sim AS (SELECT g.vec_id, g.cell,
                           CASE WHEN sqrt(list_sum(list_transform(v.v, x -> x * x)))
                                   * sqrt(list_sum(list_transform(c.c, x -> x * x))) > 0
                                THEN list_sum(list_transform(range(64), j -> v.v[j+1] * c.c[j+1]))
                                     / (sqrt(list_sum(list_transform(v.v, x -> x * x)))
                                      * sqrt(list_sum(list_transform(c.c, x -> x * x))))
                                ELSE 0.0 END AS s
                         FROM g2 g JOIN v USING (vec_id) JOIN c2 c USING (cell)),
                 r AS (SELECT vec_id, cell, s,
                         count(*) OVER (PARTITION BY cell) AS n_cell,
                         CAST(row_number() OVER (PARTITION BY cell ORDER BY s DESC, vec_id)
                           AS INTEGER) AS rank_in_cell
                       FROM sim)
            SELECT vec_id, cell, n_cell, rank_in_cell,
                   round(s + 1e-9, 4) AS centroid_sim
            FROM r WHERE rank_in_cell <= ceil(n_cell * 0.2)
            ORDER BY cell, rank_in_cell""")
  )

  /** Zero-norm-safe cosine between two DuckDB list expressions — the
    * [[graft.vector.Ivf.assign]] convention (0 = orthogonal). */
  private def cos0Sql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_sum(list_transform($a, x -> x * x)))
                * sqrt(list_sum(list_transform($b, x -> x * x))) > 0
             THEN list_sum(list_transform(range(64), j -> $a[j+1] * $b[j+1]))
                  / (sqrt(list_sum(list_transform($a, x -> x * x)))
                   * sqrt(list_sum(list_transform($b, x -> x * x))))
             ELSE 0.0 END"""

  /** ANN quality measurement (`AnnEval.ivfRecall`): recall@10 of the
    * IVF probe (nprobe=2 of nlist=8) against exact brute-force ground
    * truth for a 20-query eval sample — the harness that tunes
    * nlist/nprobe in every production vector system. The oracle replays
    * EVERYTHING: the k-means train (q220's chain), final cell
    * assignment, per-query probe-cell choice, both top-k ranks on the
    * 6-decimal similarity grid, and the intersection count — so a
    * drifted centroid, a mis-probed cell, or an off-by-one in either
    * top-k changes a recall number and hash-mismatches. */
  private val q222 = GQ(
    "q222_ann_recall",
    (s, dir) => graft.vector.AnnEval.ivfRecall(
      emb(s, dir), k = 10, nlist = 8, nprobe = 2, nQueries = 20, iters = 2),
    Some(s"""WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                        FROM embeddings),
                 init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
                            v AS c
                          FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 8),
                 ${assignSql("init", "g0")},
                 ${recomputeSql("g0", "c1")},
                 ${assignSql("c1", "g1")},
                 ${recomputeSql("g1", "c2")},
                 ${assignSql("c2", "g2")},
                 q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 20),
                 exact AS (SELECT qid, id FROM (
                   SELECT q.qid, v.vec_id AS id,
                     row_number() OVER (PARTITION BY q.qid ORDER BY
                       round(${cos0Sql("v.v", "q.qv")} + 1e-9, 6) DESC,
                       v.vec_id) AS rn
                   FROM v CROSS JOIN q) x WHERE rn <= 10),
                 probe AS (SELECT qid, cell FROM (
                   SELECT q.qid, c.cell,
                     row_number() OVER (PARTITION BY q.qid ORDER BY
                       round(${cos0Sql("q.qv", "c.c")} + 1e-9, 6) DESC,
                       c.cell) AS crn
                   FROM q CROSS JOIN c2 c) y WHERE crn <= 2),
                 approx AS (SELECT qid, id FROM (
                   SELECT p.qid, g.vec_id AS id,
                     row_number() OVER (PARTITION BY p.qid ORDER BY
                       round(${cos0Sql("v.v", "q.qv")} + 1e-9, 6) DESC,
                       g.vec_id) AS rn
                   FROM g2 g JOIN probe p USING (cell)
                        JOIN v ON v.vec_id = g.vec_id
                        JOIN q ON q.qid = p.qid) z WHERE rn <= 10),
                 hits AS (SELECT e.qid, count(*) AS h
                          FROM exact e JOIN approx a
                            ON e.qid = a.qid AND e.id = a.id
                          GROUP BY e.qid)
            SELECT q.qid AS query_id,
                   CAST(coalesce(h.h, 0) AS INTEGER) AS hits,
                   round(coalesce(h.h, 0) / 10.0 + 1e-9, 4) AS recall_at_k
            FROM q LEFT JOIN hits h ON h.qid = q.qid
            ORDER BY query_id""")
  )

  /** The deterministic PQ train→encode chain (m=8, ksub=16, iters=1)
    * as DuckDB CTEs over `v` — the q208/q214 chain, factored for the
    * multi-query recall oracles (q231/q232). Ends at `codes(vec_id,
    * sub, cell)` + `cent(sub, cell, c)`. */
  private val pqTrainCtes = s"""subs AS (SELECT vec_id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS sv
                          FROM v, UNNEST(range(8)) AS s(sub)),
                 pinit AS (SELECT sub,
                            row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS cell,
                            sv AS c
                          FROM subs
                          QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= 16),
                 d1 AS (SELECT p.vec_id, p.sub, i.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - i.c[j+1]) * (p.sv[j+1] - i.c[j+1]))), i.cell) AS rn
                        FROM subs p JOIN pinit i USING (sub)),
                 pasg AS (SELECT vec_id, sub, cell FROM d1 WHERE rn = 1),
                 cdim AS (SELECT a.sub, a.cell, d.dim,
                            round(avg(p.sv[d.dim+1]) + 1e-9, 6) AS mval
                          FROM pasg a JOIN subs p USING (vec_id, sub),
                               UNNEST(range(8)) AS d(dim)
                          GROUP BY a.sub, a.cell, d.dim),
                 cent AS (SELECT sub, cell, list(mval ORDER BY dim) AS c
                          FROM cdim GROUP BY sub, cell),
                 d2 AS (SELECT p.vec_id, p.sub, c.cell,
                          row_number() OVER (PARTITION BY p.vec_id, p.sub ORDER BY
                            list_sum(list_transform(range(8),
                              j -> (p.sv[j+1] - c.c[j+1]) * (p.sv[j+1] - c.c[j+1]))), c.cell) AS rn
                        FROM subs p JOIN cent c USING (sub)),
                 codes AS (SELECT vec_id, sub, cell FROM d2 WHERE rn = 1)"""

  /** Multi-query ADC score + top-`fetch` shortlist + 6-dp exact rerank
    * + recall CTEs shared by q231/q232 — `scoredFrom` supplies the
    * (possibly cell-restricted) scored CTE body. */
  private def recallTailSql(scoredBody: String): String =
    s"""qsub AS (SELECT q.qid, s.sub, q.qv[s.sub*8+1 : s.sub*8+8] AS sv
                 FROM q, UNNEST(range(8)) AS s(sub)),
        qn AS (SELECT qid, sqrt(sum(list_sum(list_transform(sv, x -> x * x)))) AS qnorm
               FROM qsub GROUP BY qid),
        scored AS ($scoredBody),
        short AS (SELECT qid, vec_id FROM (
          SELECT s.qid, s.vec_id,
            row_number() OVER (PARTITION BY s.qid ORDER BY
              round(CASE WHEN n.qnorm * sqrt(s.n2) > 0
                         THEN s.dots / (n.qnorm * sqrt(s.n2))
                         ELSE -1.0 END + 1e-9, 4) DESC,
              s.vec_id) AS rn
          FROM scored s JOIN qn n USING (qid)) x WHERE rn <= 100),
        approx AS (SELECT qid, id FROM (
          SELECT sh.qid, vv.vec_id AS id,
            row_number() OVER (PARTITION BY sh.qid ORDER BY
              round(${cos0Sql("vv.v", "q.qv")} + 1e-9, 6) DESC, vv.vec_id) AS rn
          FROM short sh JOIN v vv ON vv.vec_id = sh.vec_id
               JOIN q ON q.qid = sh.qid) z WHERE rn <= 10),
        exact AS (SELECT qid, id FROM (
          SELECT q.qid, vv.vec_id AS id,
            row_number() OVER (PARTITION BY q.qid ORDER BY
              round(${cos0Sql("vv.v", "q.qv")} + 1e-9, 6) DESC, vv.vec_id) AS rn
          FROM v vv CROSS JOIN q) e WHERE rn <= 10),
        hits AS (SELECT e.qid, count(*) AS h
                 FROM exact e JOIN approx a ON e.qid = a.qid AND e.id = a.id
                 GROUP BY e.qid)
   SELECT q.qid AS query_id,
          CAST(coalesce(h.h, 0) AS INTEGER) AS hits,
          round(coalesce(h.h, 0) / 10.0 + 1e-9, 4) AS recall_at_k
   FROM q LEFT JOIN hits h ON h.qid = q.qid
   ORDER BY query_id"""

  /** PQ recall harness (`AnnEval.pqRecall`): recall@10 of the two-stage
    * PQ search (ADC shortlist of 100 → exact rerank) vs brute-force
    * ground truth for a 20-query eval sample — the measured tuning loop
    * for fetch/m/ksub, the q222 discipline extended to the PQ family.
    * The oracle replays EVERYTHING in SQL: the deterministic codebook
    * train/encode (q208's chain), every query's ADC lookup-table scores
    * on the 4-dp grid, the per-query 100-id shortlist, the 6-dp exact
    * rerank, both top-k ranks, and the intersection counts. */
  private val q231 = GQ(
    "q231_pq_recall",
    (s, dir) => graft.vector.AnnEval.pqRecall(
      emb(s, dir), k = 10, fetch = 100, m = 8, ksub = 16, iters = 1,
      nQueries = 20),
    Some(s"""WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                        FROM embeddings),
                 $pqTrainCtes,
                 q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 20),
                 ${recallTailSql(
      """SELECT co.vec_id, qs.qid,
                sum(list_sum(list_transform(range(8), j -> qs.sv[j+1] * ce.c[j+1]))) AS dots,
                sum(list_sum(list_transform(ce.c, x -> x * x))) AS n2
         FROM codes co
         JOIN cent ce USING (sub, cell)
         JOIN qsub qs ON qs.sub = co.sub
         GROUP BY co.vec_id, qs.qid""")}""")
  )

  /** Combined IVF+PQ recall harness (`AnnEval.ivfPqRecall`): recall@10
    * of the production search shape — probe nprobe=2 of nlist=8 cells,
    * ADC-shortlist 100 within them, exact-rerank — vs brute-force
    * ground truth. Measures the PRODUCT of the two approximations
    * (cell recall × ADC rank fidelity), closing the tuning loop for
    * nlist/nprobe/fetch/m/ksub together; unlike q215 (nprobe = nlist,
    * exact replay of the pure-PQ chain) this gate pins the genuinely
    * approximate path. Oracle = q222's IVF chain + q208's PQ chain +
    * per-query probe restriction, fully replayed. */
  private val q232 = GQ(
    "q232_ivfpq_recall",
    (s, dir) => graft.vector.AnnEval.ivfPqRecall(
      emb(s, dir), k = 10, nlist = 8, nprobe = 2, fetch = 100, m = 8,
      ksub = 16, ivfIters = 2, pqIters = 1, nQueries = 20),
    Some(s"""WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                        FROM embeddings),
                 init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
                            v AS c
                          FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 8),
                 ${assignSql("init", "g0")},
                 ${recomputeSql("g0", "c1")},
                 ${assignSql("c1", "g1")},
                 ${recomputeSql("g1", "c2")},
                 ${assignSql("c2", "g2")},
                 $pqTrainCtes,
                 q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 20),
                 probe AS (SELECT qid, cell FROM (
                   SELECT q.qid, c.cell,
                     row_number() OVER (PARTITION BY q.qid ORDER BY
                       round(${cos0Sql("q.qv", "c.c")} + 1e-9, 6) DESC,
                       c.cell) AS crn
                   FROM q CROSS JOIN c2 c) y WHERE crn <= 2),
                 ${recallTailSql(
      """SELECT co.vec_id, qs.qid,
                sum(list_sum(list_transform(range(8), j -> qs.sv[j+1] * ce.c[j+1]))) AS dots,
                sum(list_sum(list_transform(ce.c, x -> x * x))) AS n2
         FROM codes co
         JOIN g2 g ON g.vec_id = co.vec_id
         JOIN probe p ON p.cell = g.cell
         JOIN cent ce ON ce.sub = co.sub AND ce.cell = co.cell
         JOIN qsub qs ON qs.sub = co.sub AND qs.qid = p.qid
         GROUP BY co.vec_id, qs.qid""")}""")
  )

  /** Scalar-quantized (SQ8) persisted index (`Sq`): per-dim [min, max]
    * bounds train in ONE dim-keyed aggregate (no codebook loop), every
    * vector encodes to d bytes, the table reopens COLD from bounds in
    * TBLPROPERTIES, and search scores reconstruction cosine over the
    * codes. The oracle replays the ENTIRE chain — exact per-dim
    * min/max, the explicit half-up byte code, reconstruction, cosine,
    * top-20 — so biased bounds, a round-tripping error through table
    * properties, a drifted code formula, or a degenerate-dim mishandle
    * all hash-mismatch. Encode/search are zero-shuffle projections
    * (SqSpec plan pin); top-k is TakeOrderedAndProject. */
  private val q277 = GQ(
    "q277_sq8_search",
    (s, dir) => {
      val path = Scratch.dir("sq8idx")
      graft.vector.Sq.build(emb(s, dir), path)
      val reopened = graft.tables.GraftTable.load(s, path)
      graft.vector.Sq.topK(reopened, queryVec(s, dir), 20)
    },
    Some("""WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            b AS (SELECT CAST(t.i AS INT) AS dim,
                         min(e[CAST(t.i AS INT) + 1]) AS mn,
                         max(e[CAST(t.i AS INT) + 1]) AS mx
                  FROM v, UNNEST(range(64)) AS t(i) GROUP BY 1),
            r AS (SELECT v.vec_id, b.dim,
                         CASE WHEN b.mx > b.mn
                           THEN b.mn + floor((e[b.dim + 1] - b.mn) / (b.mx - b.mn) * 255.0 + 0.5)
                                / 255.0 * (b.mx - b.mn)
                           ELSE b.mn END AS xr
                  FROM v, b),
            q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
                  FROM embeddings WHERE vec_id = 0),
            s AS (SELECT r.vec_id,
                         sum(r.xr * q.qe[r.dim + 1]) AS dot,
                         sum(r.xr * r.xr) AS n2
                  FROM r, q GROUP BY 1),
            qn AS (SELECT sqrt(list_sum(list_transform(qe, x -> x * x))) AS qn FROM q)
            SELECT s.vec_id,
                   round(CASE WHEN s.n2 > 0 THEN s.dot / (qn.qn * sqrt(s.n2))
                         ELSE -1.0 END + 1e-9, 4) AS sim
            FROM s, qn
            ORDER BY sim DESC, vec_id LIMIT 20""")
  )

  override def queries: Seq[GQ] =
    Seq(q80, q81, q82, q83, q84, q208, q211, q213, q214, q215, q217, q220,
      q222, q231, q232, q277)
}
