package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality measurement — recall@k of the IVF probe against exact
  * brute-force ground truth, per query. Every production vector system
  * ships this harness: nlist/nprobe are tuned by measuring recall on a
  * held-out query sample, not guessed, and a silent recall collapse
  * (bad centroids after a re-train, a skewed cell) is caught by running
  * it on each index build.
  *
  * Scale shape: the query set is bounded (an eval sample, not the
  * corpus), so exact ground truth is ONE broadcast pass — every corpus
  * partition scores all Q queries locally and only (qid, id, sim)
  * triples reach the per-query top-k shuffle, never the embeddings.
  * The probe side touches only `nprobe/nlist` of the corpus by cell
  * key. Cost is Q × corpus multiply-adds — the price of exact ground
  * truth; at 100 TB you run it on a corpus sample, which changes
  * nothing in the plan.
  *
  * Determinism contract (what lets the q222 gate replay the whole
  * harness in the DuckDB oracle): centroids on the 6-decimal grid
  * ([[Ivf.kmeansCentroids]] `roundCentroidsTo = Some(6)`), corpus cell
  * membership by [[Ivf.assign]]'s exact argmin, and BOTH top-k ranks
  * ordered by the 6-decimal-rounded similarity with id/cell
  * tie-breaks — so the selected top-k sets are bit-identical across
  * engines and runs. Zero-norm vectors score 0 (orthogonal), the
  * [[Ivf.assign]] convention.
  *
  * Output: query_id, hits (|exact ∩ probed| of k), recall_at_k.
  */
object AnnEval {

  private def cosine0(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val denom = VectorOps.normPre(a) * VectorOps.normPre(b)
    when(denom > 0, VectorOps.dotPre(a, b) / denom).otherwise(lit(0.0))
  }

  def ivfRecall(emb: DataFrame, k: Int, nlist: Int, nprobe: Int,
      nQueries: Int, iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nprobe > 0 && nprobe <= nlist,
      s"nprobe must be in [1, nlist], got nprobe=$nprobe nlist=$nlist")
    require(nQueries > 0, s"nQueries must be positive, got $nQueries")
    // norms hoisted to once-per-row (inside cosine0 the higher-order
    // norm would re-run per PAIR of the 50k-pair ground-truth join) and
    // the pair dot through the codegen'd DotProduct expression — same
    // sequential double sums, bit-identical sims
    val v = emb.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("__vn", VectorOps.normPre(col("v")))
    val centroids = Ivf.kmeansCentroids(emb, nlist, iters, idCol, vecCol,
      roundCentroidsTo = Some(6))
    val queries = v.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"), col("__vn").as("__qn"))
    val dp = graft.functions.DotProduct.dot_product(
      emb.sparkSession, col("v"), col("qv"))
    val rsim = round(
      when(col("__vn") * col("__qn") > 0, dp / (col("__vn") * col("__qn")))
        .otherwise(lit(0.0)) + lit(1e-9), 6)
    val topkByQ = Window.partitionBy("qid")
      .orderBy(col("__sim").desc, col("id"))

    // Exact ground truth: one broadcast pass, top-k per query.
    val exact = v.crossJoin(broadcast(queries))
      .withColumn("__sim", rsim)
      .withColumn("__rn", row_number().over(topkByQ))
      .filter(col("__rn") <= k)
      .select("qid", "id")

    // Probe list: nprobe nearest cells per query (metadata-scale).
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("__cs", round(cosine0(col("qv"), col("c")) + lit(1e-9), 6))
      .withColumn("__crn", row_number().over(
        Window.partitionBy("qid").orderBy(col("__cs").desc, col("cell"))))
      .filter(col("__crn") <= nprobe)
      .select("qid", "cell")

    // Probe path: only rows in probed cells are scored. `assign` projects
    // to (id, v, cell) — restore the hoisted norm for rsim.
    val approx = Ivf.assign(v, centroids)
      .withColumn("__vn", VectorOps.normPre(col("v")))
      .join(broadcast(probed), "cell")
      .join(broadcast(queries), "qid")
      .withColumn("__sim", rsim)
      .withColumn("__rn", row_number().over(topkByQ))
      .filter(col("__rn") <= k)
      .select("qid", "id")

    val hits = exact.join(approx, Seq("qid", "id")).groupBy("qid")
      .agg(count(lit(1)).as("__h"))
    queries.select("qid").join(hits, Seq("qid"), "left")
      .select(col("qid").as("query_id"),
        coalesce(col("__h"), lit(0L)).cast("int").as("hits"),
        round(coalesce(col("__h"), lit(0L)) / lit(k.toDouble) + lit(1e-9), 4)
          .as("recall_at_k"))
      .orderBy("query_id")
  }

  /** (id, v, __vn) double-cast frame + the bounded (qid, qv, __qn) eval
    * sample — the shared front of every recall harness. */
  private def prep(emb: DataFrame, nQueries: Int, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val v = emb.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("__vn", VectorOps.normPre(col("v")))
    val queries = v.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"), col("__vn").as("__qn"))
    (v, queries)
  }

  /** 6-dp-rounded exact cosine of (v, qv) with hoisted norms — the
    * [[ivfRecall]] rank grid (zero norms score 0, the [[Ivf.assign]]
    * convention). */
  private def rsim6(emb: DataFrame): org.apache.spark.sql.Column = {
    val dp = graft.functions.DotProduct.dot_product(
      emb.sparkSession, col("v"), col("qv"))
    round(
      when(col("__vn") * col("__qn") > 0, dp / (col("__vn") * col("__qn")))
        .otherwise(lit(0.0)) + lit(1e-9), 6)
  }

  /** hits + recall@k per query of an `approx` (qid, id) set vs the
    * exact brute-force ground truth — one broadcast pass (the
    * [[ivfRecall]] shape). */
  private def recallOf(emb: DataFrame, v: DataFrame, queries: DataFrame,
      approx: DataFrame, k: Int): DataFrame = {
    val topkByQ = Window.partitionBy("qid")
      .orderBy(col("__sim").desc, col("id"))
    val exact = v.crossJoin(broadcast(queries))
      .withColumn("__sim", rsim6(emb))
      .withColumn("__rn", row_number().over(topkByQ))
      .filter(col("__rn") <= k)
      .select("qid", "id")
    val hits = exact.join(approx, Seq("qid", "id")).groupBy("qid")
      .agg(count(lit(1)).as("__h"))
    queries.select("qid").join(hits, Seq("qid"), "left")
      .select(col("qid").as("query_id"),
        coalesce(col("__h"), lit(0L)).cast("int").as("hits"),
        round(coalesce(col("__h"), lit(0L)) / lit(k.toDouble) + lit(1e-9), 4)
          .as("recall_at_k"))
      .orderBy("query_id")
  }

  /** Exact top-k rerank of a (qid, id) shortlist on the 6-dp grid —
    * full-precision vectors touched only for shortlist rows. */
  private def rerank(emb: DataFrame, v: DataFrame, queries: DataFrame,
      short: DataFrame, k: Int): DataFrame = {
    val topkByQ = Window.partitionBy("qid")
      .orderBy(col("__sim").desc, col("id"))
    v.join(short, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("__sim", rsim6(emb))
      .withColumn("__rn", row_number().over(topkByQ))
      .filter(col("__rn") <= k)
      .select("qid", "id")
  }

  /** The bounded eval sample collected to the driver — what lets the
    * per-query ADC lookup tables ride as literals. */
  private def collectQueries(queries: DataFrame): Seq[(Long, Seq[Double])] =
    queries.select(col("qid").cast("long"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)

  /** recall@k of the PQ two-stage search ([[PqIndex.topKRerank]]'s
    * shape: ADC shortlist of `fetch` codes → exact rerank) against
    * exact ground truth — the measured tuning loop for the fetch/m/ksub
    * knobs, mirroring what [[ivfRecall]] gives nlist/nprobe. Every
    * query scores every code word (the shortlist is corpus-wide, like
    * the search it measures); determinism contract as [[ivfRecall]]
    * plus [[Pq]]'s: codebooks on the 6-dp grid, ADC ranks on the 4-dp
    * grid with id tie-breaks. */
  def pqRecall(emb: DataFrame, k: Int, fetch: Int, m: Int = 8,
      ksub: Int = 16, iters: Int = 1, nQueries: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetch >= k, s"fetch must be >= k, got fetch=$fetch k=$k")
    require(nQueries > 0, s"nQueries must be positive, got $nQueries")
    val (v, queries) = prep(emb, nQueries, idCol, vecCol)
    val cents = Pq.trainCodebooks(emb, m, ksub, iters, idCol, vecCol)
    val codes = Pq.encode(emb, cents, m, idCol, vecCol)
      .select(col(idCol).cast("long").as("id"), col("codes"))
    val pairs = codes.crossJoin(broadcast(queries.select("qid")))
    val short = Pq.adcRankPairs(pairs, cents, collectQueries(queries), fetch)
    recallOf(emb, v, queries, rerank(emb, v, queries, short, k), k)
  }

  /** recall@k of the combined IVF+PQ search ([[IvfPq.search]]'s shape:
    * probe `nprobe` cells → ADC shortlist `fetch` within them → exact
    * rerank) against exact ground truth — the quality product of the
    * two approximations (cell recall × ADC rank fidelity) measured as
    * one number per query, closing the tuning loop for
    * nlist/nprobe/fetch/m/ksub together. Only codes in a query's probed
    * cells are scored, exactly like the search it measures. */
  def ivfPqRecall(emb: DataFrame, k: Int, nlist: Int, nprobe: Int,
      fetch: Int, m: Int = 8, ksub: Int = 16, ivfIters: Int = 2,
      pqIters: Int = 1, nQueries: Int = 20, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetch >= k, s"fetch must be >= k, got fetch=$fetch k=$k")
    require(nprobe > 0 && nprobe <= nlist,
      s"nprobe must be in [1, nlist], got nprobe=$nprobe nlist=$nlist")
    require(nQueries > 0, s"nQueries must be positive, got $nQueries")
    val (v, queries) = prep(emb, nQueries, idCol, vecCol)
    val centroids = Ivf.kmeansCentroids(emb, nlist, ivfIters, idCol, vecCol,
      roundCentroidsTo = Some(6))
    // nprobe nearest cells per query on the 6-dp grid (ivfRecall's probe)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("__cs", round(cosine0(col("qv"), col("c")) + lit(1e-9), 6))
      .withColumn("__crn", row_number().over(
        Window.partitionBy("qid").orderBy(col("__cs").desc, col("cell"))))
      .filter(col("__crn") <= nprobe)
      .select("qid", "cell")
    val cents = Pq.trainCodebooks(emb, m, ksub, pqIters, idCol, vecCol)
    val codes = Pq.encode(emb, cents, m, idCol, vecCol)
      .select(col(idCol).cast("long").as("id"), col("codes"))
    val pairs = codes
      .join(Ivf.assign(v, centroids).select("id", "cell"), Seq("id"))
      .join(broadcast(probed), Seq("cell"))
      .select("qid", "id", "codes")
    val short = Pq.adcRankPairs(pairs, cents, collectQueries(queries), fetch)
    recallOf(emb, v, queries, rerank(emb, v, queries, short, k), k)
  }
}
