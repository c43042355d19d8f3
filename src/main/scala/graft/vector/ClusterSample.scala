package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling for training-data curation
  * (SemDeDup-style: embed → cluster → keep a per-cluster quota of the
  * most-central representatives). Where a uniform sample keeps the
  * corpus's redundancy, the per-cell quota caps every semantic
  * neighborhood at `ceil(fraction * cell_size)` rows, so over-represented
  * content (boilerplate clusters, template families) is down-weighted and
  * rare clusters survive — the curation step that decides what a 100 TB
  * crawl contributes to a training mix.
  *
  * Scale shape: the coarse quantizer is [[Ivf.kmeansCentroids]] (shuffles
  * bounded by k·d, never N·d); assignment is [[Ivf.assign]]'s narrow
  * zero-shuffle pass against literal centroids; ranking is ONE keyed
  * shuffle on the cell id. Cell count `k` should grow with the corpus so
  * per-cell cardinality stays executor-sized — the same knob IVF search
  * already scales by.
  *
  * Determinism contract: centroids are trained with
  * `roundCentroidsTo = Some(6)` (see [[Ivf.kmeansCentroids]]) so cell
  * membership and centrality are bit-reproducible across engines and
  * runs — which is what lets the q220 gate replay the whole train →
  * assign → quota pipeline in the DuckDB oracle. Zero-norm vectors score
  * 0 (orthogonal) instead of NaN, the [[Ivf.assign]] convention.
  *
  * Output: vec_id, cell, n_cell, rank_in_cell (1 = most central),
  * centroid_sim (cosine to own centroid, rounded to 4dp for display;
  * the RANK uses the unrounded value).
  */
object ClusterSample {

  def clusterBalancedSample(emb: DataFrame, k: Int, fraction: Double,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val centroids = Ivf.kmeansCentroids(emb, k, iters, idCol, vecCol,
      roundCentroidsTo = Some(6))
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val denom = VectorOps.normPre(col("v")) * VectorOps.normPre(col("c"))
    val assigned = Ivf.assign(v, centroids)
      .join(broadcast(centroids), "cell")
      .withColumn("__sim",
        when(denom > 0, VectorOps.dotPre(col("v"), col("c")) / denom)
          .otherwise(lit(0.0)))
    val byCell = Window.partitionBy("cell")
    val byCentrality = byCell.orderBy(col("__sim").desc, col("id"))
    assigned
      .withColumn("n_cell", count(lit(1)).over(byCell))
      .withColumn("rank_in_cell", row_number().over(byCentrality))
      .filter(col("rank_in_cell") <= ceil(col("n_cell") * lit(fraction)))
      .select(col("id").as(idCol), col("cell"), col("n_cell"),
        col("rank_in_cell"),
        round(col("__sim") + lit(1e-9), 4).as("centroid_sim"))
  }
}
