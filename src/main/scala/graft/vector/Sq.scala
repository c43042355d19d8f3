package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Scalar quantization (SQ8) for approximate nearest neighbor — the
  * third member of the standard quantization family next to [[Ivf]]
  * (partitioning) and [[Pq]] (subspace codebooks): each DIMENSION
  * quantizes independently to one byte against per-dim [min, max]
  * bounds trained from the corpus (the FAISS `SQ8` / Milvus `SQ8`
  * shape), compressing d·4 float bytes → d bytes with no codebook
  * training loop at all. Where PQ wins at extreme compression, SQ8 is
  * the cheap-build/cheap-update point: bounds are ONE aggregate over
  * the corpus, encode is a pure projection, and appends never retrain.
  *
  * Scale design: bounds are metadata (2·d doubles, driver-inlined
  * literals — the [[Ivf]] centroid idiom); training shuffles only
  * dim-keyed partial min/max (cardinality d, map-side combined);
  * encode and search are zero-shuffle narrow projections; top-k plans
  * as TakeOrderedAndProject.
  *
  * Determinism: bounds are exact corpus min/max per dim (no arithmetic
  * noise — both engines agree bit-for-bit on a min of floats); codes
  * use `floor(t · 255 + 0.5)` (explicit half-up — engine-portable,
  * unlike round()'s per-engine tie rules); a degenerate dim
  * (max == min) codes 0 and reconstructs its constant. The q277 gate
  * replays bounds, codes, reconstruction, and the cosine rerank in
  * SQL, so the TRAINER and the encode are oracle-gated, not just the
  * search.
  */
object Sq {

  /** Per-dim bounds, dim-ordered. */
  final case class Bounds(mins: Seq[Double], maxs: Seq[Double]) {
    require(mins.size == maxs.size, "mins/maxs must align")
    def dims: Int = mins.size
  }

  /** Train bounds: one dim-keyed min/max aggregate (cardinality d). */
  def trainBounds(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Bounds = {
    val rows = emb
      .select(posexplode(transform(col(vecCol), x => x.cast("double")))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("dim").collect()
    require(rows.nonEmpty, "cannot train SQ bounds on an empty frame")
    Bounds(rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** Byte code for dim value `x` under (mn, mx): explicit half-up. */
  private def codeOf(x: Column, mn: Column, mx: Column): Column =
    when(mx > mn,
      floor((x - mn) / (mx - mn) * lit(255.0) + lit(0.5)).cast("int"))
      .otherwise(lit(0))

  /** Encode every vector to its d-byte code word — zero-shuffle
    * projection against the broadcast-literal bounds. Output: idCol,
    * codes array<int>. */
  def encode(emb: DataFrame, b: Bounds, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val mnL = graft.functions.VecLit.doubles(b.mins)
    val mxL = graft.functions.VecLit.doubles(b.maxs)
    emb.select(col(idCol),
      zip_with(
        zip_with(transform(col(vecCol), x => x.cast("double")), mnL,
          (x, mn) => struct(x.as("x"), mn.as("mn"))),
        mxL,
        (p, mx) => codeOf(p.getField("x"), p.getField("mn"), mx))
        .as("codes"))
  }

  /** Reconstructed dim value for code `c`: mn + c/255 · (mx − mn). */
  private def reconOf(c: Column, mn: Column, mx: Column): Column =
    when(mx > mn, mn + c.cast("double") / lit(255.0) * (mx - mn))
      .otherwise(mn)

  /** Approximate top-k by reconstruction cosine over a codes frame
    * (`idCol`, `codes array<int>`): decode against the bounds literals
    * and score — d multiply-adds per row, all inside the scan
    * projection. Zero-reconstruction rows rank last (sim −1) instead of
    * NaN-poisoning the ordering; the query must have non-zero norm. */
  def sqTopK(codes: DataFrame, b: Bounds, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val qnorm = math.sqrt(queryVec.foldLeft(0.0)((acc, x) => acc + x * x))
    require(qnorm > 0, "query vector must have non-zero norm")
    require(queryVec.size == b.dims, "query/bounds dim mismatch")
    val mnL = graft.functions.VecLit.doubles(b.mins)
    val mxL = graft.functions.VecLit.doubles(b.maxs)
    val qL = graft.functions.VecLit.doubles(queryVec)
    val recon = zip_with(
      zip_with(col("codes"), mnL, (c, mn) => struct(c.as("c"), mn.as("mn"))),
      mxL, (p, mx) => reconOf(p.getField("c"), p.getField("mn"), mx))
    // dot and sqrt(Σx²) through the codegen kernels — sqrt(n2) computed
    // as NormL2 (same sum order then sqrt; n2 > 0 ⟺ norm > 0)
    val dot = VectorOps.dot(recon, qL)
    val rn = VectorOps.norm(recon)
    codes.select(col(idCol),
        round(when(rn > 0, dot / (lit(qnorm) * rn))
            .otherwise(lit(-1.0)) + lit(1e-9), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Train + encode + search in one call (the in-session form). */
  def searchTopK(emb: DataFrame, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = trainBounds(emb, idCol, vecCol)
    sqTopK(encode(emb, b, idCol, vecCol), b, queryVec, k, idCol)
  }

  // ---- persisted index (the PqIndex pattern) -----------------------------

  private[vector] val BoundsProp = "graft.sq.bounds"

  private[vector] def encodeBounds(b: Bounds): String =
    b.mins.mkString(",") + ";" + b.maxs.mkString(",")

  private[vector] def decodeBounds(s: String): Bounds = {
    val Array(mn, mx) = s.split(";", 2)
    Bounds(mn.split(",").toSeq.map(_.toDouble),
      mx.split(",").toSeq.map(_.toDouble))
  }

  /** Train bounds, encode every vector, persist `(idCol, codes)` with
    * the bounds riding TBLPROPERTIES — train once, reopen and search
    * with zero reads of vector data. Appends of NEW vectors reuse the
    * stored bounds (encode + append; values outside the trained range
    * clamp at the code extremes — re-train when drift matters). */
  def build(emb: DataFrame, path: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): GraftTable = {
    val b = trainBounds(emb, idCol, vecCol)
    val codes = encode(emb, b, idCol, vecCol)
      // clamp future-proofs appends; build-corpus codes are in-range
      .select(col(idCol),
        transform(col("codes"), c => greatest(lit(0), least(lit(255), c)))
          .as("codes"))
    val t = GraftTable.create(emb.sparkSession, path, codes.schema,
      Map(BoundsProp -> encodeBounds(b)))
    t.append(codes, "SQ INDEX BUILD")
    t
  }

  /** Bounds recovered from a (possibly reopened) index table. */
  def bounds(t: GraftTable): Bounds =
    decodeBounds(t.properties.getOrElse(BoundsProp,
      throw new IllegalArgumentException(
        s"${t.path} is not an SQ index table: property $BoundsProp missing " +
          "(build one with Sq.build)")))

  /** Encode a new batch under the STORED bounds and append — no
    * retrain, the cheap-update half of the SQ tradeoff. Out-of-range
    * values clamp at the code extremes. */
  def append(t: GraftTable, emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val b = bounds(t)
    t.append(encode(emb, b, idCol, vecCol)
      .select(col(idCol),
        transform(col("codes"), c => greatest(lit(0), least(lit(255), c)))
          .as("codes")), "SQ INDEX APPEND")
  }

  /** Reconstruction-cosine top-k over the persisted codes. */
  def topK(t: GraftTable, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id"): DataFrame =
    sqTopK(t.read(), bounds(t), queryVec, k, idCol)

  /** Production search shape: SQ shortlist of `fetch` ids, exact cosine
    * rerank of only those full-precision vectors (broadcast semi-join —
    * `fetch` stays O(k), never O(N)). */
  def topKRerank(t: GraftTable, emb: DataFrame, queryVec: Seq[Double],
      k: Int, fetch: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val short = topK(t, queryVec, fetch, idCol).select(col(idCol))
    VectorOps.cosineTopK(
      emb.join(broadcast(short), Seq(idCol), "left_semi"),
      queryVec, k, idCol, vecCol)
  }
}
