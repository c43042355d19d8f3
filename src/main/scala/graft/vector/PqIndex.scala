package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Persisted PQ index: every vector's m-byte code word materialized as a
  * [[GraftTable]] with the per-subspace codebooks in TBLPROPERTIES —
  * train once, reopen and search many. The same persisted-artifact
  * pattern [[AnnIndex]] uses for IVF (and the reference uses for
  * profiling state, `30-performance/delta-optimizer/deltaoptimizer.py:114-155`):
  * the expensive steps (codebook training, encoding) run at build time;
  * a search session recovers the full index from table metadata with
  * zero reads of vector data.
  *
  * 100 TB shape: searches scan only the code column (64-dim float32
  * corpus ≈ 256 GB/10⁹ vectors → 8 GB of codes at m=8), score via an
  * m×ksub lookup table, and rerank just `fetch` full-precision vectors
  * through a broadcast semi-join — never N.
  */
object PqIndex {

  private[vector] val CodebooksProp = "graft.pq.codebooks"

  /** `sub:cell:v1,v2,...;...` — flat, escaping-free (doubles and small
    * ints only), the AnnIndex centroid-property idiom. */
  private[vector] def encodeCodebooks(cbs: Seq[Pq.Codebook]): String =
    cbs.sortBy(cb => (cb.sub, cb.cell))
      .map(cb => s"${cb.sub}:${cb.cell}:" + cb.c.mkString(","))
      .mkString(";")

  private[vector] def decodeCodebooks(s: String): Seq[Pq.Codebook] =
    s.split(";").toSeq.filter(_.nonEmpty).map { part =>
      val Array(sub, cell, vec) = part.split(":", 3)
      Pq.Codebook(sub.toInt, cell.toInt, vec.split(",").toSeq.map(_.toDouble))
    }

  /** Train codebooks, encode every vector, persist `(idCol, codes)` with
    * the codebooks riding TBLPROPERTIES. */
  def build(emb: DataFrame, path: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): GraftTable = {
    val cents = Pq.trainCodebooks(emb, m, ksub, iters, idCol, vecCol)
    val codes = Pq.encode(emb, cents, m, idCol, vecCol)
    val t = GraftTable.create(emb.sparkSession, path, codes.schema,
      Map(CodebooksProp -> encodeCodebooks(cents)))
    t.append(codes, "PQ INDEX BUILD")
    t
  }

  /** The codebooks recovered from a (possibly reopened) index table —
    * metadata only, no data reads. */
  def codebooks(t: GraftTable): Seq[Pq.Codebook] =
    decodeCodebooks(t.properties.getOrElse(CodebooksProp,
      throw new IllegalArgumentException(
        s"${t.path} is not a PQ index table: property $CodebooksProp missing " +
          "(build one with PqIndex.build)")))

  /** ADC top-k over the persisted codes — touches no vector data at all. */
  def adcTopK(t: GraftTable, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id"): DataFrame =
    Pq.adcScore(t.read(), codebooks(t), queryVec, k, idCol)

  /** Production search shape: ADC shortlist of `fetch` ids from the code
    * table, exact cosine rerank of only those full-precision vectors
    * (broadcast semi-join — `fetch` stays O(k), never O(N)). */
  def topKRerank(t: GraftTable, emb: DataFrame, queryVec: Seq[Double],
      k: Int, fetch: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val short = adcTopK(t, queryVec, fetch, idCol).select(col(idCol))
    VectorOps.cosineTopK(
      emb.join(broadcast(short), Seq(idCol), "left_semi"),
      queryVec, k, idCol, vecCol)
  }
}
