package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprColumn
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, MapType, StructField, StructType}

import graft.functions.{AdcLookup, PqCodebookData, PqEncode, PqNearestSub, VecLit}

/** Product quantization (PQ) for approximate nearest neighbor at scale
  * (FAISS-style IVFADC building block, expressed as pure DataFrame
  * programs): each d-dim vector splits into `m` disjoint subvectors of
  * d/m dims; per subspace a small k-means codebook (`ksub` centroids)
  * quantizes subvectors to one byte-sized code, compressing vectors
  * d·4 bytes → m bytes (64-dim float → 8 bytes at m=8). Queries score
  * against codes via an asymmetric distance computation (ADC): one
  * m×ksub lookup table built per query, so scoring costs m table adds
  * per vector instead of d multiplies.
  *
  * Scale design mirrors [[Ivf]]: codebooks are metadata (m·ksub·(d/m) =
  * d·ksub doubles) and live as driver-inlined literals; training shuffles
  * only (sub, cell, dim)-keyed partial sums — cardinality m·ksub·d/m, not
  * N·d; encoding and ADC scoring are zero-shuffle narrow projections over
  * the vectors, and top-k plans as TakeOrderedAndProject.
  *
  * Determinism: init = the ksub lowest-id subvectors per subspace; Lloyd
  * assignment breaks distance ties toward the lowest cell; recomputed
  * centroids round to 1e-6 (far coarser than fp noise, far finer than
  * quantization error) so codebooks are bit-reproducible across engines —
  * the correctness gate (q208) replays the entire training in DuckDB SQL.
  */
object Pq {

  /** Driver-side codebooks: (sub, cell, centroid). */
  final case class Codebook(sub: Int, cell: Int, c: Seq[Double])

  /** The codebook as ONE collapsed literal (vs a per-element lit() tree
    * of thousands of nodes re-analyzed per action — optimization guide
    * §4). */
  private def centLit(cents: Seq[Codebook]): Column =
    VecLit.of(cents.map(cb => Row(cb.sub, cb.cell, cb.c)), PqCodebookData.schema)

  /** Argmin cell for subvector `sv` within subspace `sub` (ties → lowest
    * cell, matching the oracle's ORDER BY dist, cell) — the codegen
    * kernel; formerly an interpreted array_min(transform(filter(...)))
    * lambda chain (VecNativeSpec pins bit-equality). */
  private def nearestCell(cents: Column, sub: Column, sv: Column): Column =
    ExprColumn.column(PqNearestSub(ExprColumn.expression(sv),
      ExprColumn.expression(sub), ExprColumn.expression(cents)))

  /** (id, sub, sv): each vector exploded into its m subvectors. */
  private def subspaces(emb: DataFrame, m: Int, dsub: Int,
      idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("v"), s * dsub + 1, dsub).as("sv"))): _*)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Train per-subspace codebooks with `iters` Lloyd rounds. Vector dims
    * must divide evenly into m subspaces. Cells that end a round empty are
    * dropped (codes can never reference them). */
  def trainCodebooks(emb: DataFrame, m: Int, ksub: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Codebook] = {
    val firstRow = emb.select(size(col(vecCol))).take(1)
    require(firstRow.nonEmpty,
      "cannot train PQ codebooks on an empty embeddings frame")
    val dims = firstRow.head.getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val subs = subspaces(emb, m, dsub, idCol, vecCol)
    val w = Window.partitionBy("sub").orderBy("id")
    var cents: Seq[Codebook] = subs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).cast("int").as("cell"), col("sv"))
      .collect().map(r => Codebook(r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq
    (1 to iters).foreach { _ =>
      val cl = centLit(cents)
      cents = subs
        .withColumn("cell", nearestCell(cl, col("sub"), col("sv")))
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("sub", "cell", "dim")
        .agg(round(avg("x") + lit(1e-9), 6).as("m"))
        .groupBy("sub", "cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("sub"), col("cell"),
          transform(col("dm"), s => s.getField("m")).as("c"))
        .collect().map(r => Codebook(r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .toSeq
    }
    cents.sortBy(cb => (cb.sub, cb.cell))
  }

  /** The m-byte code word for an already-double vector column — the
    * encode expression factored out so composed builders (e.g.
    * [[IvfPq]], which carries the IVF cell through the same projection)
    * encode without a self-join back to [[encode]]'s output. */
  private[vector] def codesExpr(cents: Seq[Codebook], m: Int, v: Column): Column = {
    // PqEncode derives m from the codebook itself; callers still pass m
    // for the ADC table sizing — pin the two sources of truth together,
    // or the code-word length would silently diverge from the lookup
    // tables (r18 ADVICE finding)
    require(cents.map(_.sub).max + 1 == m,
      s"codebook spans ${cents.map(_.sub).max + 1} subspaces, caller says $m")
    ExprColumn.column(PqEncode(ExprColumn.expression(v),
      ExprColumn.expression(centLit(cents))))
  }

  /** Encode every vector to its m-byte code word — a single zero-shuffle
    * narrow projection (no explode: all m argmins evaluate per row).
    * Output: idCol, codes array<int>. */
  def encode(emb: DataFrame, cents: Seq[Codebook], m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
      .select(col(idCol), codesExpr(cents, m, col("__v")).as("codes"))

  /** Approximate top-k by ADC cosine: train + encode, then score each
    * code word against a per-query m×ksub lookup table (dot and squared
    * norm per centroid, computed once on the driver) — reconstruction
    * cosine = Σ_s dot(q_s, c_s) / (|q| · sqrt(Σ_s |c_s|²)), exact for the
    * quantized vector because subspaces are disjoint coordinates.
    *
    * Contract: `queryVec` must have non-zero norm (cosine to a zero
    * vector is undefined; unguarded it would NaN every sim and scramble
    * the top-k). A vector whose RECONSTRUCTION is all-zero ranks last
    * (sim −1) instead of NaN-poisoning the ordering. */
  def adcTopK(emb: DataFrame, queryVec: Seq[Double], k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // non-zero-norm contract enforced in adcScore, which sees the same value
    val cents = trainCodebooks(emb, m, ksub, iters, idCol, vecCol)
    val codes = encode(emb, cents, m, idCol, vecCol)
    adcScore(codes, cents, queryVec, k, idCol)
  }

  /** ADC-score a codes frame (`idCol`, `codes array<int>`) against
    * per-query lookup tables built from `cents` — shared by the
    * in-session [[adcTopK]] and the persisted-table [[PqIndex]] search
    * path. m, ksub and dsub all derive from the codebooks. */
  private[vector] def adcScore(codes: DataFrame, cents: Seq[Codebook],
      queryVec: Seq[Double], k: Int, idCol: String): DataFrame = {
    val qnorm = math.sqrt(queryVec.foldLeft(0.0)((acc, x) => acc + x * x))
    require(qnorm > 0, "query vector must have non-zero norm (cosine is undefined for it)")
    require(cents.nonEmpty, "codebooks are empty — not a trained PQ index")
    val m = cents.map(_.sub).max + 1
    val ksub = cents.map(_.cell).max + 1
    val dsub = cents.head.c.size
    // per-(sub, cell) lookup tables, dense over cell ids (unused slots for
    // dropped-empty cells keep positional indexing valid; codes never
    // reference them)
    val bySubCell = cents.map(cb => (cb.sub, cb.cell) -> cb.c).toMap
    // dense m×ksub lookup tables as ONE collapsed literal each; the
    // per-code-word sum is the AdcLookup codegen kernel (same 0-based
    // positional adds, sequential order)
    def table(f: (Int, Seq[Double]) => Double): Column =
      VecLit.doubles2((0 until m).map(s => (0 until ksub).map { c =>
        bySubCell.get((s, c)).map(v => f(s, v)).getOrElse(0.0)
      }))
    val dots = table((s, c) =>
      c.zip(queryVec.slice(s * dsub, s * dsub + dsub)).foldLeft(0.0) {
        case (acc, (x, q)) => acc + x * q
      })
    val norms2 = table((_, c) => c.foldLeft(0.0)((acc, x) => acc + x * x))
    def lookup(tbl: Column): Column =
      ExprColumn.column(AdcLookup(ExprColumn.expression(col("codes")),
        ExprColumn.expression(tbl)))
    val n2 = lookup(norms2)
    codes.select(col(idCol),
        round(when(n2 > 0, lookup(dots) / (lit(qnorm) * sqrt(n2)))
            .otherwise(lit(-1.0)) + lit(1e-9), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Rank an already-formed (qid, id, codes) candidate frame by ADC
    * cosine, keeping the top `fetch` ids per query — the multi-query
    * batched counterpart of [[adcScore]] shared by the recall harness
    * ([[AnnEval.pqRecall]] scores every query against every code;
    * [[AnnEval.ivfPqRecall]] pre-restricts pairs to probed cells). The
    * per-query m×ksub lookup tables ride as ONE map literal keyed by
    * qid (queries are a bounded eval sample, the [[Ivf]] centroid
    * idiom), so scoring stays a zero-shuffle projection; the only wide
    * stage is the per-query top-`fetch` rank. Same rounding (4 dp) and
    * zero-norm sentinel (−1, ranks last) as [[adcScore]]. */
  private[vector] def adcRankPairs(pairs: DataFrame,
      cents: Seq[Codebook], queries: Seq[(Long, Seq[Double])],
      fetch: Int): DataFrame = {
    require(cents.nonEmpty, "codebooks are empty — not a trained PQ index")
    require(queries.nonEmpty, "query sample is empty")
    val m = cents.map(_.sub).max + 1
    val ksub = cents.map(_.cell).max + 1
    val dsub = cents.head.c.size
    val bySubCell = cents.map(cb => (cb.sub, cb.cell) -> cb.c).toMap
    // tables and the per-query map as collapsed literals (the qid-keyed
    // map previously inlined queries × m × ksub lit() nodes — the
    // largest literal tree in the repo); lookups via the AdcLookup
    // kernel (foldable norms2 → primitive double[][]; the per-row dots
    // table rides the generic ArrayData path)
    def tableSeq(f: (Int, Seq[Double]) => Double): Seq[Seq[Double]] =
      (0 until m).map(s => (0 until ksub).map { c =>
        bySubCell.get((s, c)).map(v => f(s, v)).getOrElse(0.0)
      })
    val norms2 = VecLit.doubles2(tableSeq((_, c) => c.foldLeft(0.0)((acc, x) => acc + x * x)))
    val qmap = VecLit.of(
      queries.map { case (qid, qv) =>
        val qn = math.sqrt(qv.foldLeft(0.0)((acc, x) => acc + x * x))
        val dots = tableSeq((s, c) =>
          c.zip(qv.slice(s * dsub, s * dsub + dsub)).foldLeft(0.0) {
            case (acc, (x, q)) => acc + x * q
          })
        qid -> Row(qn, dots)
      }.toMap,
      MapType(LongType, StructType(Seq(
        StructField("qn", DoubleType, nullable = false),
        StructField("dots", ArrayType(VecLit.doubleArr, containsNull = false),
          nullable = false))), valueContainsNull = false))
    def lookup(tbl: Column): Column =
      ExprColumn.column(AdcLookup(ExprColumn.expression(col("codes")),
        ExprColumn.expression(tbl)))
    val q = element_at(qmap, col("qid"))
    val n2 = lookup(norms2)
    val sim = round(
      when(q.getField("qn") * sqrt(n2) > 0,
        lookup(q.getField("dots")) / (q.getField("qn") * sqrt(n2)))
        .otherwise(lit(-1.0)) + lit(1e-9), 4)
    pairs.select(col("qid"), col("id"), sim.as("__asim"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("__asim").desc, col("id"))))
      .filter(col("__rn") <= fetch)
      .select("qid", "id")
  }

  /** Two-stage search (the production PQ shape): a cheap ADC pass over
    * the m-byte codes shortlists `fetch` candidates, then exact cosine
    * reranks only those — full-precision vectors are touched for `fetch`
    * rows, not N. On the test corpus a 20% shortlist recovers the exact
    * top-10 (PqSpec); at 100 TB `fetch` stays O(k), a constant-sized
    * broadcast semi-join against the code scan. */
  def topKRerank(emb: DataFrame, queryVec: Seq[Double], k: Int,
      fetch: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val short = adcTopK(emb, queryVec, fetch, m, ksub, iters, idCol, vecCol)
      .select(col(idCol))
    VectorOps.cosineTopK(
      emb.join(broadcast(short), Seq(idCol), "left_semi"),
      queryVec, k, idCol, vecCol)
  }
}
