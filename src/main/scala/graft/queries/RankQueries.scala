package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{LmScore, Rank}
import graft.vector.VectorOps

/** Ranked retrieval + domain selection over the `documents` /
  * `embeddings` tables: BM25 keyword search, hybrid BM25+vector fusion
  * (RRF), and DSIR-style importance weighting — the retrieval layer of a
  * training-data curation stack. Every gate is fully replayed by its
  * DuckDB oracle (model retrained, ranks recomputed in SQL).
  */
object RankQueries extends QueryBatch {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.t(s, dir, "embeddings")

  private val terms = Seq("merge", "vector", "spark")
  private val termsSql = terms.map(t => s"'$t'").mkString(", ")

  private def qv(s: SparkSession, dir: String): Seq[Double] =
    emb(s, dir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  // zero-norm-safe: the engine scores a zero-norm vector with the -1
  // sentinel (VectorOps.cosineTopK) — the oracle must agree, not divide
  // by zero
  private val cosineSql =
    """CASE WHEN sqrt(list_sum(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(64), i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))) > 0
            THEN list_sum(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))
                 / (sqrt(list_sum(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))
                  * sqrt(list_sum(list_transform(range(64), i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE))))
            ELSE -1.0 END"""

  // shared oracle CTE chain: tokenize → corpus stats → query-term tf → df
  private val bm25Ctes = s"""toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                       FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(len(w))::DOUBLE AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, u.term, count(*) AS tf,
                          any_value(len(t.w)) AS dl
                   FROM toks t, UNNEST(t.w) AS u(term)
                   WHERE u.term IN ($termsSql) GROUP BY 1, 2),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            bm AS (SELECT tf.doc_id,
                          round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
                                    * tf.tf * (1.2 + 1)
                                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)))
                                + 1e-9, 4) AS score
                   FROM tf JOIN df USING (term) CROSS JOIN stats s
                   GROUP BY tf.doc_id)"""

  /** Okapi BM25 top-k (`Rank.bm25TopK`): one corpus scan; only
    * query-term tokens shuffle; df broadcast; TakeOrderedAndProject
    * top-k. The oracle retrains every statistic (N, avgdl, tf, df) and
    * rescores in SQL, so a drifted idf or length normalization
    * hash-mismatches. */
  private val q233 = GQ(
    "q233_bm25_topk",
    (s, dir) => Rank.bm25TopK(docs(s, dir), terms, 20),
    Some(s"""WITH $bm25Ctes
             SELECT doc_id, score FROM bm
             ORDER BY score DESC, doc_id LIMIT 20""")
  )

  /** Hybrid retrieval (`Rank.rrfFuse`): BM25 top-50 and exact-cosine
    * top-50 (query = vec_id 0, joined on doc_id = vec_id) fused by
    * reciprocal rank — rank-based, so no score calibration between the
    * lexical and vector spaces. Both rankings re-derive in the oracle;
    * ranks tie-break on rounded score then id so both engines agree. */
  private val q234 = GQ(
    "q234_hybrid_rrf",
    (s, dir) => {
      val bmRanks = Rank.ranked(Rank.bm25TopK(docs(s, dir), terms, 50), "score")
      val simRanks = Rank.ranked(
        VectorOps.cosineTopK(emb(s, dir), qv(s, dir), 50)
          .withColumnRenamed("vec_id", "doc_id"), "sim")
      Rank.rrfFuse(Seq(bmRanks, simRanks))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    },
    Some(s"""WITH $bm25Ctes,
             bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
                     FROM bm ORDER BY score DESC, doc_id LIMIT 50),
             sim AS (SELECT e.vec_id AS doc_id,
                            round($cosineSql + 1e-9, 4) AS sim
                     FROM embeddings e,
                          (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
             simr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r
                      FROM sim ORDER BY sim DESC, doc_id LIMIT 50),
             u AS (SELECT doc_id, r FROM bmr UNION ALL SELECT doc_id, r FROM simr)
             SELECT doc_id, round(sum(1.0 / (60 + r)) + 1e-9, 6) AS rrf,
                    count(*) AS n_lists
             FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 20""")
  )

  /** DSIR-style domain selection (`LmScore.importanceWeights`): unigram
    * target-vs-raw log-likelihood-ratio weights (target = lang 'en'),
    * top-100 deterministic selection. The oracle retrains BOTH unigram
    * models and rescores every document in SQL — a wrong smoothing
    * denominator, a dropped vocabulary term, or a target-count leak
    * shifts a weight and hash-mismatches. */
  private val q235 = GQ(
    "q235_importance_sampling",
    (s, dir) => LmScore.importanceWeights(docs(s, dir), col("lang") === "en")
      .orderBy(col("weight").desc, col("doc_id")).limit(100),
    Some("""WITH toks AS (SELECT doc_id,
                            unnest(string_split_regex(lower(trim(text)), '\s+')) AS w,
                            lang = 'en' AS tgt
                          FROM documents),
                 v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM toks),
                 n AS (SELECT count(*)::DOUBLE AS n_raw,
                              sum(CASE WHEN tgt THEN 1 ELSE 0 END)::DOUBLE AS n_tgt
                       FROM toks),
                 lp AS (SELECT w,
                          ln((sum(CASE WHEN tgt THEN 1 ELSE 0 END) + 0.5) / (n.n_tgt + 0.5 * v.v))
                          - ln((count(*) + 0.5) / (n.n_raw + 0.5 * v.v)) AS llr
                        FROM toks CROSS JOIN n CROSS JOIN v
                        GROUP BY w, n.n_tgt, n.n_raw, v.v)
            SELECT t.doc_id, round(avg(lp.llr) + 1e-9, 4) AS weight,
                   count(*) AS n_tokens
            FROM toks t JOIN lp USING (w)
            GROUP BY t.doc_id
            ORDER BY weight DESC, doc_id LIMIT 100""")
  )

  /** Positional-index exact phrase scan (`PhraseIndex.phraseScan`): the
    * targeted contamination probe — "which documents contain THIS exact
    * 3-word benchmark phrase, and how often". Phrases are drawn
    * deterministically from the corpus itself (words 4–6 of every doc_id
    * ≡ 3 mod 100, id < 1000 — an eval set is fixed-size by nature, and
    * the bound is what keeps the probe linear in the corpus), the
    * positional posting list is
    * pruned to the phrase vocabulary BEFORE any positional join
    * (broadcast semi-join), and adjacency runs as (doc, pos+k) equi-hash
    * joins. The oracle replays tokenize-with-position, phrase
    * extraction, and the three-way positional join in SQL, so a dropped
    * occurrence, a off-by-one position, or a cross-doc false match
    * hash-mismatches. */
  private val q263 = GQ(
    "q263_phrase_scan",
    (s, dir) => {
      val d = docs(s, dir)
      graft.text.PhraseIndex.phraseScan(
          d, graft.text.PhraseIndex.phrasesFromDocs(d))
        .orderBy("phrase_doc")
    },
    Some("""WITH docs AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
                          FROM documents),
            p AS (SELECT doc_id, CAST(t.i AS INT) AS pos, ws[CAST(t.i AS INT) + 1] AS tok
                  FROM docs, UNNEST(range(len(ws))) AS t(i)
                  WHERE len(ws[CAST(t.i AS INT) + 1]) > 0),
            ph AS (SELECT doc_id AS phrase_doc, ws[4] AS w1, ws[5] AS w2, ws[6] AS w3,
                          ws[4] || ' ' || ws[5] || ' ' || ws[6] AS phrase
                   FROM docs WHERE doc_id % 100 = 3 AND doc_id < 1000
                     AND len(ws) >= 6),
            hits AS (SELECT ph.phrase_doc, ph.phrase, p1.doc_id, p1.pos
                     FROM ph
                     JOIN p p1 ON p1.tok = ph.w1
                     JOIN p p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1 AND p2.tok = ph.w2
                     JOIN p p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2 AND p3.tok = ph.w3)
            SELECT phrase_doc, phrase,
                   count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_hits,
                   min(doc_id) AS first_doc
            FROM hits GROUP BY 1, 2 ORDER BY phrase_doc""")
  )

  override def queries: Seq[GQ] = Seq(q233, q234, q235, q263)
}
