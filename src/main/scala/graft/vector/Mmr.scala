package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversification (Carbonell & Goldstein,
  * SIGIR '98): rerank a relevance-ordered candidate list so each pick
  * balances query similarity against redundancy with what's already
  * picked —
  *
  *   mmr(d) = λ · sim(q, d) − (1 − λ) · max_{s ∈ selected} sim(d, s)
  *
  * the standard de-duplicating rerank for retrieval-augmented pipelines
  * (top-k near-identical crawl pages are worth one slot, not k).
  *
  * Scale shape: the corpus-scale work — scoring every vector against the
  * query and taking the top-`nCand` — is the distributed
  * [[VectorOps.cosineTopK]] scan (or an index probe). The greedy loop is
  * inherently sequential (pick i depends on picks 1..i−1), so it runs on
  * the driver over the COLLECTED candidate set — a bounded `nCand`-row
  * collect (a few hundred rows, the same driver-traffic class as
  * centroids/codebooks), never the corpus. All similarities are rounded
  * to 4 dp BEFORE the greedy comparisons (same `+1e-9` + HALF_UP contract
  * as every gate), so selection is deterministic and replayable by an
  * engine-independent oracle.
  *
  * Reference scope: the reference's retrieval surface stops at SQL
  * filtering; MMR extends it with the diversity rerank a curation stack
  * pairs with BM25/ANN retrieval (`text/Rank.scala`, `vector/AnnIndex`).
  */
object Mmr {

  /** Spark/DuckDB ROUND semantics: epsilon nudge then half-away-from-zero. */
  private def r4(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Greedy MMR selection of `k` from the cosine top-`nCand`.
    * Output: rank (1-based pick order), idCol, sim (query similarity,
    * 4 dp), mmr (the winning marginal score, 4 dp). */
  def rerank(emb: DataFrame, queryVec: Seq[Double], nCand: Int, k: Int,
      lambda: Double = 0.7,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && nCand >= k, s"need nCand >= k > 0, got nCand=$nCand k=$k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = emb.sparkSession
    val q = graft.functions.VecLit.doubles(queryVec)
    require(queryVec.exists(_ != 0.0), "query vector must have non-zero norm")
    // ONE bounded collect: id, rounded query-sim, unit-normalized vector.
    // Zero-norm vectors are dropped BEFORE the top-nCand take — their
    // cosine is undefined and their "normalized" form is a NaN array
    // that would poison the pairwise dots (and r4 throws on NaN). The
    // filter precedes the order+limit so the plan stays a single scan +
    // TakeOrderedAndProject.
    val vn = VectorOps.norm(col(vecCol))
    // id stays TYPE-GENERIC (numeric, string, …): collected as-is, carried
    // through to an output schema built from the input id field — casting
    // to long here would NPE on string/null ids (review finding). The
    // orderBy uses the column's native ordering, so numeric ids keep the
    // exact pre-generic candidate order.
    val idField = emb.schema(idCol)
    val cand: Array[(Any, Double, Array[Double])] = emb
      .filter(vn > 0)
      .select(col(idCol).as("id"),
        round(VectorOps.cosine(col(vecCol), q) + lit(1e-9), 4).as("sim"),
        VectorOps.normalized(col(vecCol)).as("v"))
      // nulls LAST to agree with the driver-side tie-break's idOrd (a
      // keyed row beats an unkeyed one on both sides of the cut —
      // Spark's asc default is nulls first, the opposite)
      .orderBy(col("sim").desc, col("id").asc_nulls_last).limit(nCand)
      .collect()
      .map(r => (r.get(0), r.getDouble(1), r.getSeq[Double](2).toArray))

    // pairwise sim of unit vectors = sequential dot, same rounding contract
    def pairSim(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      r4(s)
    }

    // deterministic tie-break on the RUNTIME id value, matched to
    // SPARK'S sort order (the candidate cut above sorts with it, so the
    // two sides of the nCand boundary must agree): floating ids compare
    // via Double/Float.compare (NaN deterministically last, no
    // BigDecimal parse crash on NaN/Infinity), integral ids exactly via
    // BigDecimal — identical to the old `cast("long")` ordering —
    // strings by unsigned UTF-8 bytes (Spark's UTF8String binary order,
    // which differs from String.compareTo for supplementary
    // characters); nulls sort last on BOTH sides of the cut
    // (asc_nulls_last above) so a keyed row always beats an unkeyed one.
    def utf8Compare(x: String, y: String): Int = {
      val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
      val n = math.min(xb.length, yb.length)
      var i = 0
      while (i < n) {
        val d = (xb(i) & 0xff) - (yb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      xb.length - yb.length
    }
    val idOrd: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => 1
        case (_, null) => -1
        case (x: java.lang.Double, y: java.lang.Double) =>
          java.lang.Double.compare(x, y)
        case (x: java.lang.Float, y: java.lang.Float) =>
          java.lang.Float.compare(x, y)
        case (x: java.lang.Number, y: java.lang.Number) =>
          BigDecimal(x.toString).compare(BigDecimal(y.toString))
        case (x: String, y: String) => utf8Compare(x, y)
        case (x, y) => x.toString.compareTo(y.toString)
      }
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Double, Double)]
    val selectedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.ArrayBuffer(cand.toIndexedSeq: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case c @ (_, sim, v) =>
        val red = if (selectedVecs.isEmpty) 0.0
                  else selectedVecs.map(pairSim(v, _)).max
        (c, r4(lambda * sim - (1 - lambda) * red))
      }
      val (pick, mmr) = scored.minBy { case ((id, _, _), m) => (-m, id) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, idOrd))
      selected += ((selected.size + 1, pick._1, pick._2, mmr))
      selectedVecs += pick._3
      remaining -= pick
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      idField.copy(name = idCol),
      org.apache.spark.sql.types.StructField("sim",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("mmr",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val rows = selected.toSeq.map { case (rk, id, sim, m) =>
      org.apache.spark.sql.Row(rk, id, sim, m)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
