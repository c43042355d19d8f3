package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: Okapi BM25 keyword scoring
  * and reciprocal-rank fusion (RRF) of heterogeneous rankings — the
  * lexical half of a hybrid (keyword + vector) search stack, the shape
  * retrieval-augmented training-data curation uses to pull topical
  * subsets out of a crawl.
  *
  * BM25 (Robertson & Walker, TREC-3; the Okapi formulation with the
  * `+1`-stabilized idf used by Lucene):
  *
  *   score(d, Q) = Σ_{t∈Q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
  *                 · tf_td (k1 + 1) / (tf_td + k1 (1 − b + b·dl_d/avgdl))
  *
  * Scale shape: the corpus is scanned ONCE; the only per-token work that
  * shuffles is the stream already filtered to the query's terms (the
  * `isin` runs before the exchange, so shuffle volume is bounded by
  * documents-matching-the-query, not corpus tokens). Document length and
  * the (N, avgdl) scalars ride the same scan as projections + one
  * aggregate; per-term document frequencies are |Q| rows, broadcast back.
  * Nothing collects to the driver beyond the two corpus scalars.
  *
  * RRF (Cormack, Clarke & Büttcher, SIGIR'09): fused(d) = Σ_r 1/(c + rank_r(d))
  * over the input rankings — rank-based, so it needs no score calibration
  * between BM25 and cosine similarity. Each input ranking is already
  * top-N-bounded, so the union + re-aggregate is driver-free and tiny.
  *
  * Reference scope: the reference's retrieval surface is SQL-warehouse
  * keyword filtering (HF/dbsqlclient.py query paths); BM25/RRF extend it
  * to the ranked-retrieval operators a training-data pipeline needs.
  */
object Rank {

  /** BM25 scores for every document matching ≥1 query term (4-dp rounded
    * so the DuckDB oracle's float path agrees). Output: idCol, score. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val w = docs.select(col(idCol), TextOps.words(col(textCol)).as("__w"))
      .withColumn("__dl", size(col("__w")).cast("double"))
    // corpus scalars: one aggregate over the scan's length projection
    val stats = w.agg(count(lit(1)).cast("double").as("n"), avg("__dl").as("avgdl")).head()
    val n = stats.getDouble(0)
    if (n == 0) return docs.select(col(idCol), lit(0.0).as("score")).limit(0)
    val avgdl = stats.getDouble(1)
    // per-(doc, term) frequency — the isin filter runs BEFORE the
    // exchange, so only query-term occurrences shuffle
    val tf = w.select(col(idCol), col("__dl"), explode(col("__w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"), max("__dl").as("__dl"))
    // per-term document frequency: |Q| rows, broadcast back
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(df), Seq("term"))
      .withColumn("__idf", log((lit(n) - col("__df") + 0.5) / (col("__df") + 0.5) + 1))
      .withColumn("__s", col("__idf") * col("__tf") * (k1 + 1) /
        (col("__tf") + (col("__dl") / avgdl * b + (1 - b)) * k1))
      .groupBy(idCol)
      .agg(round(sum("__s") + lit(1e-9), 4).as("score"))
  }

  /** Top-k BM25 with deterministic (score desc, id) tie-break —
    * plans the final step as TakeOrderedAndProject. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25(docs, queryTerms, k1, b, idCol, textCol)
      .orderBy(col("score").desc, col(idCol)).limit(k)

  /** 1-based ranks of an already-top-N-bounded scored list. The global
    * window is single-partition by construction — call this only on
    * post-limit lists (≤ a few hundred rows), never on a corpus. */
  def ranked(topList: DataFrame, scoreCol: String, idCol: String = "doc_id"): DataFrame =
    topList.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))))
      .select(col(idCol), col("rank"))

  /** Reciprocal-rank fusion of rankings (each: idCol, rank). Output:
    * idCol, rrf (6-dp), n_lists — callers order/limit. */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (col("rank") + c)) + lit(1e-9), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }
}
