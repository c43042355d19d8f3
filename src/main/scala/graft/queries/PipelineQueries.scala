package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.CorpusOps
import graft.vector.{Mmr, VectorOps}

/** Corpus-release dataflows: the deterministic global shuffle that lays
  * out a training corpus into shards, the per-domain dataset-card report,
  * cosine range search, MMR diversity rerank, and per-stratum
  * winsorization — the last-mile operators between a curated corpus and
  * a training run. Every gate fully replays in the DuckDB oracle
  * (selection arithmetic is engine-independent by construction).
  */
object PipelineQueries extends QueryBatch {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "embeddings")

  private def qv(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    emb(s, dir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  /** DuckDB cosine between embedding rows aliased `a` and `b` (64-d),
    * zero-norm-safe: −1 sentinel, matching `VectorOps` (a zero-norm row
    * must rank last / fail every floor in BOTH engines). */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_sum(list_transform(range(64), i -> $a.embedding[i+1]::DOUBLE * $a.embedding[i+1]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(64), i -> $b.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))) > 0
             THEN list_sum(list_transform(range(64), i -> $a.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))
                  / (sqrt(list_sum(list_transform(range(64), i -> $a.embedding[i+1]::DOUBLE * $a.embedding[i+1]::DOUBLE)))
                   * sqrt(list_sum(list_transform(range(64), i -> $b.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))))
             ELSE -1.0 END"""

  /** Deterministic shuffle-to-shards (`CorpusOps.shuffleShards`): the
    * overflow-safe Knuth scramble places every document in one of 8
    * shards with a dense in-shard position — pure integer arithmetic, so
    * the oracle replays placement AND order exactly. An off-by-one in the
    * position, a wrong modulus, or a nondeterministic tie-break
    * hash-mismatches. */
  private val q237 = GQ(
    "q237_shuffle_shards",
    (s, dir) => CorpusOps.shuffleShards(docs(s, dir), 8)
      .orderBy("shard", "pos"),
    Some("""WITH h AS (SELECT doc_id,
                         ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h
                       FROM documents)
            SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
                        AS BIGINT) AS pos
            FROM h ORDER BY shard, pos""")
  )

  /** Per-domain dataset-card report (`CorpusOps.domainReport`): doc/token
    * counts, mean length, exact-dup rate (distinct fingerprints — the
    * oracle counts distinct normalized text, the same partition since
    * sha256 is injective in practice), token share of the corpus. */
  private val q238 = GQ(
    "q238_domain_report",
    (s, dir) => CorpusOps.domainReport(docs(s, dir)).orderBy("lang", "source"),
    Some("""WITH d AS (SELECT lang, source, n_chars,
                         len(string_split_regex(lower(trim(text)), '\s+')) AS nt,
                         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
                       FROM documents),
                 g AS (SELECT lang, source,
                         count(*) AS n_docs,
                         CAST(sum(nt) AS BIGINT) AS n_tokens,
                         round(avg(n_chars) + 1e-9, 2) AS avg_chars,
                         count(DISTINCT norm) AS n_uniq
                       FROM d GROUP BY 1, 2)
            SELECT lang, source, n_docs, n_tokens, avg_chars,
                   round(1 - n_uniq::DOUBLE / n_docs + 1e-9, 4) AS dup_rate,
                   round(n_tokens::DOUBLE / sum(n_tokens) OVER () + 1e-9, 6)
                     AS token_share
            FROM g ORDER BY lang, source""")
  )

  /** Cosine range search (`VectorOps.rangeSearch`): every vector within
    * similarity ≥ 0.3 of query vec_id 0 — the radius dual of top-k. The
    * filter cuts on the ROUNDED score, so the boundary is
    * engine-replayable. */
  private val q239 = GQ(
    "q239_range_search",
    (s, dir) => VectorOps.rangeSearch(emb(s, dir), qv(s, dir), 0.3)
      .orderBy(col("sim").desc, col("vec_id")),
    Some(s"""SELECT e.vec_id, round(${cosSql("e", "q")} + 1e-9, 4) AS sim
             FROM embeddings e,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             WHERE round(${cosSql("e", "q")} + 1e-9, 4) >= 0.3
             ORDER BY sim DESC, e.vec_id""")
  )

  /** MMR diversity rerank (`Mmr.rerank`): greedy λ=0.7 selection of 10
    * from the cosine top-50. The oracle UNROLLS all ten greedy steps in
    * SQL (each pick is an argmax over candidates minus the growing
    * selected set, redundancy = max pairwise sim to selected) — a wrong
    * λ, a stale redundancy term, or a tie-break drift picks a different
    * document at some step and hash-mismatches. */
  private val q240 = GQ(
    "q240_mmr_rerank",
    (s, dir) => Mmr.rerank(emb(s, dir), qv(s, dir), nCand = 50, k = 10,
      lambda = 0.7).orderBy("rank"),
    Some(mmrOracle(nCand = 50, k = 10))
  )

  /** The greedy steps chain CTE references (s_i → sel_{i-1} → … → s_1);
    * without MATERIALIZED, DuckDB inlines the chain exponentially and
    * reopens the parquet per reference until it hits the fd limit. */
  private def mmrOracle(nCand: Int, k: Int): String = {
    val base = s"""WITH cand AS MATERIALIZED (
         SELECT e.vec_id AS id, round(${cosSql("e", "q")} + 1e-9, 4) AS sim,
                e.embedding AS v
         FROM embeddings e,
              (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         ORDER BY sim DESC, id LIMIT $nCand),
       pair AS MATERIALIZED (
         SELECT a.id AS ia, b.id AS ib,
                round(list_sum(list_transform(range(64), i -> a.v[i+1]::DOUBLE * b.v[i+1]::DOUBLE))
                      / (sqrt(list_sum(list_transform(range(64), i -> a.v[i+1]::DOUBLE * a.v[i+1]::DOUBLE)))
                       * sqrt(list_sum(list_transform(range(64), i -> b.v[i+1]::DOUBLE * b.v[i+1]::DOUBLE))))
                      + 1e-9, 4) AS s
         FROM cand a, cand b),
       s1 AS MATERIALIZED (SELECT id, sim, 1 AS rank, round(0.7 * sim + 1e-9, 4) AS mmr
              FROM cand ORDER BY sim DESC, id LIMIT 1),
       sel1 AS MATERIALIZED (SELECT id FROM s1)"""
    val steps = (2 to k).map { i =>
      val p = i - 1
      s""",
       s$i AS MATERIALIZED (SELECT c.id, c.sim, $i AS rank,
                round(0.7 * c.sim - (1 - 0.7) *
                      (SELECT max(p.s) FROM pair p
                       WHERE p.ia = c.id AND p.ib IN (SELECT id FROM sel$p))
                      + 1e-9, 4) AS mmr
              FROM cand c WHERE c.id NOT IN (SELECT id FROM sel$p)
              ORDER BY mmr DESC, c.id LIMIT 1),
       sel$i AS MATERIALIZED (SELECT id FROM sel$p UNION ALL SELECT id FROM s$i)"""
    }.mkString
    val union = (1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""$base$steps
        SELECT CAST(rank AS INTEGER) AS rank, CAST(id AS BIGINT) AS vec_id,
               sim, mmr
        FROM ($union) ORDER BY rank"""
  }

  /** Per-language winsorization (`CorpusOps.winsorize`): exact
    * linear-interpolated p05/p95 of document length, clip counts, raw vs
    * winsorized mean. Spark's `percentile` and DuckDB's `quantile_cont`
    * share the h = (n−1)p interpolation, so the bounds replay exactly. */
  private val q241 = GQ(
    "q241_winsorize",
    (s, dir) => CorpusOps.winsorize(docs(s, dir), "lang", "n_chars")
      .orderBy("lang"),
    Some("""WITH b AS (SELECT lang,
                         quantile_cont(n_chars, 0.05) AS p_lo,
                         quantile_cont(n_chars, 0.95) AS p_hi
                       FROM documents GROUP BY lang)
            SELECT d.lang,
                   round(b.p_lo + 1e-9, 2) AS p_lo,
                   round(b.p_hi + 1e-9, 2) AS p_hi,
                   CAST(sum(CASE WHEN d.n_chars < b.p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                   CAST(sum(CASE WHEN d.n_chars > b.p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
                   round(avg(d.n_chars) + 1e-9, 2) AS mean_raw,
                   round(avg(greatest(b.p_lo, least(b.p_hi, d.n_chars))) + 1e-9, 2)
                     AS mean_winsorized
            FROM documents d JOIN b USING (lang)
            GROUP BY d.lang, b.p_lo, b.p_hi ORDER BY lang""")
  )

  /** The ANN twin of q218's production loop: an embedding batch STREAMS
    * in, foreachBatch probes the PERSISTED IVF index
    * (`AnnIndex.probePairs` — batch × probed-cells, never batch ×
    * corpus), drops every vector that near-duplicates the corpus at
    * cosine ≥ 0.95, and APPENDS the survivors to the index assigned to
    * their nearest existing cell (`AnnIndex.append` — the FAISS `add`
    * contract, no retrain). The batch re-ingests the whole corpus under
    * shifted ids (all must die against their own sources) plus five
    * one-hot novel vectors orthogonal-ish to everything (all must
    * survive). Maintenance is proven in-gate: a re-ingest of the novels
    * under fresh ids must now collide with their appended copies. Output
    * = final index membership, exactly replayable by the oracle. */
  private val q242 = GQ(
    "q242_stream_vector_ingest",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.streaming.Trigger
      import graft.vector.AnnIndex
      val e = emb(s, dir).select("vec_id", "embedding")
      val idx = AnnIndex.buildIvf(e, Scratch.dir("annloop"), nlist = 16)
      val copies = e.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val novel = s.range(5).select((col("id") + 200000).as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => when(j === col("id").cast("int"), lit(1.0f))
            .otherwise(lit(0.0f))).as("embedding"))
      val in = Scratch.dir("annloopsrc")
      copies.unionByName(novel).coalesce(1).write.mode("overwrite").parquet(in)
      val stream = s.readStream.schema(e.schema).parquet(in)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Scratch.dir("annloopckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          // single action per batch: AnnIndex.append persists its
          // assigned plan internally, so the probe inside this anti-join
          // computes exactly once — no outer persist needed
          val losers = AnnIndex.probePairs(idx, b, threshold = 0.95, nprobe = 2)
            .select(col("id1").as("vec_id")).distinct()
          AnnIndex.append(idx, b.join(losers, Seq("vec_id"), "left_anti"))
          ()
        }.start()
      stream.awaitTermination()
      // maintenance proof: the appended novels must now be probe-able —
      // fresh-id copies of them collide with their own indexed copies
      val reprobe = AnnIndex.probePairs(idx,
        novel.select((col("vec_id") + 500000).as("vec_id"), col("embedding")),
        threshold = 0.95, nprobe = 2).select("id1").distinct()
      require(reprobe.count() == 5,
        "index append must make a re-ingest of the survivors collide")
      idx.read().select("vec_id").orderBy("vec_id")
    },
    Some("""SELECT vec_id FROM embeddings
            UNION ALL SELECT 200000 + i AS vec_id FROM range(5) t(i)
            ORDER BY vec_id""")
  )

  /** Corpus version diff (`CorpusOps.corpusDiff`): the new release drops
    * every 10th doc, rewrites the text of every 7th survivor, appends
    * fresh ids, and whitespace-pads every 13th survivor — the padded
    * docs must classify UNCHANGED (fingerprints normalize whitespace),
    * the rewritten ones CHANGED; the oracle replays the full
    * classification per language. */
  private val q244 = GQ(
    "q244_corpus_diff",
    (s, dir) => {
      val d = docs(s, dir)
      val kept = d.filter(col("doc_id") % 10 =!= 0)
      val newRel = kept.withColumn("text",
          when(col("doc_id") % 7 === 0, concat(lit("rewritten "), col("text")))
            .when(col("doc_id") % 13 === 0, concat(col("text"), lit("   ")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      CorpusOps.corpusDiff(d, newRel).orderBy("lang")
    },
    Some("""WITH oldd AS (SELECT doc_id, lang,
                            regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp
                          FROM documents),
                 newd AS (SELECT doc_id, lang,
                            regexp_replace(lower(trim(
                              CASE WHEN doc_id % 7 = 0 THEN 'rewritten ' || text
                                   WHEN doc_id % 13 = 0 THEN text || '   '
                                   ELSE text END)), '\s+', ' ', 'g') AS fp
                          FROM documents WHERE doc_id % 10 <> 0
                          UNION ALL
                          SELECT doc_id + 100000, lang,
                            regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
                          FROM documents WHERE doc_id % 10 = 0),
                 j AS (SELECT coalesce(n.lang, o.lang) AS lang,
                         CASE WHEN o.fp IS NULL THEN 'added'
                              WHEN n.fp IS NULL THEN 'removed'
                              WHEN o.fp = n.fp THEN 'unchanged'
                              ELSE 'changed' END AS cls
                       FROM oldd o FULL OUTER JOIN newd n USING (doc_id))
            SELECT lang,
                   CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
                   CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                   CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
                   CAST(sum(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
            FROM j GROUP BY lang ORDER BY lang""")
  )

  override def queries: Seq[GQ] = Seq(q237, q238, q239, q240, q241, q242, q244)
}
