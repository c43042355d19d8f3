package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.vector.{Mmr, VectorOps}

/** Corpus-release operators: shard layout invariants, dataset-card report
  * arithmetic, winsorization bounds, range-search/MMR semantics — the
  * contracts the q237–q241 oracles replay plus what SQL can't pin
  * (determinism across runs, scramble overflow safety, MMR's diversity
  * guarantee). */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  // ---- shuffleShards ----

  test("shuffleShards: every doc in exactly one shard, dense 0-based positions") {
    val out = CorpusOps.shuffleShards(docs, 4).cache()
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // positions within each shard are exactly 0..n-1
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0 || col("d") =!= col("n"))
    assert(bad.isEmpty, "positions must be dense 0-based per shard")
    out.unpersist()
  }

  test("shuffleShards: deterministic across runs and uncorrelated with id order") {
    val a = CorpusOps.shuffleShards(docs, 4).orderBy("shard", "pos").collect()
    val b = CorpusOps.shuffleShards(docs, 4).orderBy("shard", "pos").collect()
    assert(a.sameElements(b), "layout must be bit-reproducible")
    // the scramble must not leave consecutive ids in id order within a shard
    val pos = CorpusOps.shuffleShards(docs, 1)
      .orderBy("pos").select("doc_id").as[Long].collect()
    assert(pos.toSeq != pos.toSeq.sorted, "order must be scrambled, not id order")
  }

  test("knuthScramble is overflow-safe past 2^31 ids and sign-safe below 0") {
    val big = Seq(2147483648L, 4294967297L, 900719925474099L,
      -1L, -2147483649L, Long.MinValue).toDF("doc_id")
    val hs = big.select(CorpusOps.knuthScramble(col("doc_id")).as("h"))
      .as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < 4294967296L), s"out of range: ${hs.toSeq}")
    // ids congruent mod 2^31 collide by construction; distinct ids below don't
    val lo = (0L until 1000L).toDF("doc_id")
      .select(CorpusOps.knuthScramble(col("doc_id")).as("h")).as[Long].collect()
    assert(lo.distinct.length == 1000, "scramble must be injective below 2^31")
  }

  // ---- domainReport ----

  test("domainReport: token shares sum to 1 and dup_rate reflects planted dups") {
    val base = docs.filter(col("doc_id") < 20)
    val planted = base
      .unionByName(base.withColumn("doc_id", col("doc_id") + 100000))
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
    val n = base.count()
    val r = CorpusOps.domainReport(planted).head()
    assert(r.getAs[Long]("n_docs") == 2 * n)
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("token_share") - 1.0) < 1e-6)
    val shares = CorpusOps.domainReport(docs)
      .agg(sum("token_share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-3, s"shares must sum to ~1, got $shares")
  }

  // ---- corpusDiff ----

  test("corpusDiff: NULL text is presence, not absence") {
    val old = Seq((1L, null: String, "en"), (2L, "x", "en"), (3L, "y", "en"))
      .toDF("doc_id", "text", "lang")
    val niu = Seq((1L, null: String, "en"), (2L, null: String, "en"), (4L, "z", "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusOps.corpusDiff(old, niu).head()
    // 1: NULL→NULL = unchanged (present both sides); 2: "x"→NULL = changed;
    // 3: removed; 4: added — fingerprint nullness must not fake absence
    assert(r.getAs[Long]("n_unchanged") == 1, r.toString)
    assert(r.getAs[Long]("n_changed") == 1, r.toString)
    assert(r.getAs[Long]("n_removed") == 1, r.toString)
    assert(r.getAs[Long]("n_added") == 1, r.toString)
  }

  // ---- winsorize ----

  test("winsorize: bounds clamp exactly the tails and clipped mean moves inward") {
    // 1..100 in one stratum: p05 = 5.95, p95 = 95.05 (h = (n-1)p)
    val d = (1 to 100).map(i => ("a", i)).toDF("lang", "n_chars")
    val r = CorpusOps.winsorize(d, "lang", "n_chars").head()
    assert(r.getAs[Double]("p_lo") == 5.95 && r.getAs[Double]("p_hi") == 95.05)
    assert(r.getAs[Long]("n_below") == 5 && r.getAs[Long]("n_above") == 5)
    assert(r.getAs[Double]("mean_raw") == 50.5)
    // outlier drags the raw mean but not the winsorized one
    val out = CorpusOps.winsorize(
      d.unionByName(Seq(("a", 1000000)).toDF("lang", "n_chars")),
      "lang", "n_chars").head()
    assert(out.getAs[Double]("mean_winsorized") < out.getAs[Double]("mean_raw"))
  }

  // ---- rangeSearch ----

  test("rangeSearch: returns exactly the vectors clearing the floor, self included") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val got = VectorOps.rangeSearch(emb, q, 0.3).cache()
    val self = got.filter(col("vec_id") === 0).head()
    assert(self.getAs[Double]("sim") == 1.0, "query must match itself at 1.0")
    assert(got.filter(col("sim") < 0.3).isEmpty)
    // agreement with brute top-k: every top-k hit above the floor is in range
    val topAbove = VectorOps.cosineTopK(emb, q, 50)
      .filter(col("sim") >= 0.3).select("vec_id").as[Long].collect().toSet
    val ranged = got.select("vec_id").as[Long].collect().toSet
    assert(topAbove.subsetOf(ranged))
    got.unpersist()
  }

  // ---- MMR ----

  test("mmr: k distinct picks, first is argmax sim, diversity beats pure top-k") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val picks = Mmr.rerank(emb, q, nCand = 30, k = 5, lambda = 0.7)
      .orderBy("rank").collect()
    assert(picks.length == 5)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    val top1 = VectorOps.cosineTopK(emb, q, 1).head().getAs[Long]("vec_id")
    assert(picks.head.getAs[Long]("vec_id") == top1, "pick 1 = most similar")
    // mmr scores are non-increasing in sim for the winning picks? not in
    // general — but each pick's mmr must be <= lambda * its sim
    picks.foreach { r =>
      assert(r.getAs[Double]("mmr") <= 0.7 * r.getAs[Double]("sim") + 1e-9)
    }
  }

  test("mmr: with duplicate vectors, the duplicate is never picked twice") {
    // plant an exact duplicate of the most similar vector
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val dup = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val withDup = emb.unionByName(dup)
    val picks = Mmr.rerank(withDup, q, nCand = 20, k = 2, lambda = 0.5)
      .orderBy("rank").collect()
    val ids = picks.map(_.getAs[Long]("vec_id")).toSet
    assert(!(ids.contains(0L) && ids.contains(999999L)),
      s"identical vectors must not both be picked: $ids")
  }

  test("mmr: id column is type-generic — string ids pick the same vectors") {
    // a string id (doc-key retrieval) must not NPE or mis-cast; picks
    // must match the numeric-id run vector-for-vector (review finding:
    // rerank used to cast idCol to long and getLong)
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val numeric = Mmr.rerank(emb, q, nCand = 20, k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id"))
    val strEmb = emb.withColumn("vec_id",
      format_string("id%06d", col("vec_id")))
    val viaString = Mmr.rerank(strEmb, q, nCand = 20, k = 5)
      .orderBy("rank").collect()
    assert(viaString.head.schema("vec_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val strIds = viaString.map(_.getAs[String]("vec_id"))
    assert(strIds.toSeq === numeric.map(i => f"id$i%06d").toSeq,
      "string-id picks must equal numeric-id picks")
  }
}
