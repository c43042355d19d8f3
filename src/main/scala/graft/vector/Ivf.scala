package graft.vector

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprColumn

import graft.functions.{IvfAssign, IvfCentsData, VecLit}

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the vectors into cells; queries probe only the
  * `nprobe` nearest cells and exact-rerank inside — the standard scale
  * path for similarity search (FAISS-style IVF-Flat), expressed as pure
  * DataFrame programs.
  *
  * Scale design: centroids are tiny and inlined as a literal; assignment
  * is one shuffle-free narrow pass over the vectors (transform +
  * array_min argmin); centroid recomputation shuffles on (cell, dim) —
  * cardinality k·d, not N·d. Nothing is ever all-pairs, and the cell
  * assignment can be persisted as a column for reuse (the "index").
  */
object Ivf {

  /** Deterministic Lloyd's k-means over `array<float|double>` vectors:
    * init = the k lowest-id vectors, `iters` assignment/recompute rounds.
    * Returns (cell, centroid: array<double>).
    *
    * `roundCentroidsTo`: snap each recomputed centroid mean to a decimal
    * grid (`round(avg + 1e-9, d)` — the [[Pq]] codebook convention). Means
    * are the one quantity whose floating-point value depends on partial-
    * aggregation order, so consumers whose OUTPUT depends on the exact
    * assignment (not just a top-k rerank) round them to make every
    * downstream assignment reproducible bit-for-bit across engines and
    * runs; `None` (default) keeps the raw means. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundCentroidsTo: Option[Int] = None): DataFrame = {
    require(emb.take(1).nonEmpty,
      "cannot cluster an empty embeddings frame (no rows to seed centroids)")
    val spark = emb.sparkSession
    val v = graft.perf.Lineage.cut(
      emb.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v")))
    // centroid frames go through a Chain: each Lloyd round's cut deletes
    // the previous round's reliable checkpoint (v stays OUTSIDE the
    // chain — it is read every round)
    val chain = new graft.perf.Lineage.Chain
    var centroids = chain.cut(
      v.orderBy("id").limit(k)
        .select((row_number().over(Window.orderBy("id")) - 1).as("cell"), col("v").as("c")))
    (1 to iters).foreach { _ =>
      val assigned = assign(v, centroids)
      val mean = roundCentroidsTo
        .fold(avg("x"))(d => round(avg("x") + lit(1e-9), d))
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(mean.as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("c"))
      centroids = chain.cut(centroids)
    }
    centroids
  }

  /** Nearest-centroid assignment as a pure narrow projection: the k
    * centroids are metadata-scale (topK already collects them to pick
    * probe cells), so they are inlined as an array literal with their
    * norms precomputed on the driver, and the argmin cell is a
    * `transform` + `array_min` over that array — zero shuffle, zero join;
    * nothing (in particular not the embedding vector, which previously
    * rode the exchange as a grouping key) ever leaves its partition. */
  private[vector] def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col("cell"), col("c")).collect()
    // one collapsed centroid literal + the IvfAssign codegen kernel —
    // same argmin: min by negSim with ties to the lowest cell id; a
    // zero-norm vector or centroid scores 0 (orthogonal) instead of
    // tripping ANSI DIVIDE_BY_ZERO — it lands in the lowest cell.
    // Formerly an interpreted array_min(transform(...)) lambda chain
    // (VecNativeSpec pins bit-equality, ties and -0.0/NaN included).
    val rows = cents.map { r =>
      val c = r.getSeq[Double](1)
      Row(r.getInt(0), c, math.sqrt(c.map(x => x * x).sum))
    }.toSeq
    val centsLit = VecLit.of(rows, IvfCentsData.schema)
    v.select(col("id"), col("v"),
      ExprColumn.column(IvfAssign(ExprColumn.expression(col("v")),
        ExprColumn.expression(centsLit))).as("cell"))
  }

  /** Build the IVF index: every vector tagged with its cell. */
  def index(emb: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val centroids = kmeansCentroids(emb, k, iters, idCol, vecCol)
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    (assign(v, centroids), centroids)
  }

  /** Approximate top-k: probe the `nprobe` cells nearest the query, exact
    * cosine rerank inside. With nprobe = nlist this is exact brute force.
    */
  def topK(emb: DataFrame, queryVec: Seq[Double], k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val (indexed, centroids) = index(emb, nlist, iters, idCol, vecCol)
    val q = VecLit.doubles(queryVec)
    // zero-norm guards mirror AnnIndex.topK: rank last, never NaN/ANSI-throw
    val cDen = VectorOps.normPre(col("c")) * VectorOps.normPre(q)
    val probeCells = centroids
      .select(col("cell"),
        when(cDen > 0, VectorOps.dotPre(col("c"), q) / cDen)
          .otherwise(lit(-1.0)).as("sim"))
      // cell id breaks sim ties (the -1.0 zero-norm sentinel manufactures
      // exact ties, and an untied desc sort would pick probe cells by
      // partition order — nondeterministic results run to run)
      .orderBy(col("sim").desc, col("cell")).limit(nprobe)
      .select("cell").collect().map(_.getInt(0)).toSeq
    val vDen = VectorOps.normPre(col("v")) * VectorOps.normPre(q)
    indexed.filter(col("cell").isin(probeCells: _*))
      .select(col("id").as(idCol),
        round(when(vDen > 0, VectorOps.dotPre(col("v"), q) / vDen)
          .otherwise(lit(-1.0)) + lit(1e-9), 4).as("sim"),
        col("cell"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
