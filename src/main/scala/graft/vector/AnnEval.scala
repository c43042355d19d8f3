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
}
