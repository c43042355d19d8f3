package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Rank + LmScore.importanceWeights semantics: exact hand-computed BM25
  * and DSIR arithmetic on tiny corpora, RRF fusion arithmetic, the
  * ranking properties each score must satisfy, and edge contracts. */
class RankSpec extends SparkTestBase {
  import spark.implicits._

  // N=3, avgdl=8/3; df(a)=1, df(c)=2; hand-derived Okapi scores
  private val tiny = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"))

  test("bm25: exact arithmetic on a tiny corpus") {
    val got = Rank.bm25(tiny.toDF("doc_id", "text"), Seq("a", "c"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.3028), (2L, 0.5235), (3L, 0.7193)))
  }

  test("bm25TopK orders by score desc with id tie-break and limits") {
    val got = Rank.bm25TopK(tiny.toDF("doc_id", "text"), Seq("a", "c"), 2)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.3028), (3L, 0.7193)))
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq((1L, "a x"), (2L, "a x x x x x x x x x"))
      .toDF("doc_id", "text")
    val s = Rank.bm25(docs, Seq("a")).as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), s"short ${s(1L)} must beat long ${s(2L)}")
  }

  test("bm25 idf: rarer term dominates with equal tf and length") {
    // 'rare' in 1 doc, 'common' in all 4; d1 matches rare, d2 common
    val docs = Seq((1L, "rare pad"), (2L, "common pad"),
      (3L, "common pad"), (4L, "common pad")).toDF("doc_id", "text")
    val s = Rank.bm25(docs, Seq("rare", "common"))
      .as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L))
  }

  test("bm25 rejects an empty query") {
    intercept[IllegalArgumentException](
      Rank.bm25(tiny.toDF("doc_id", "text"), Nil))
  }

  test("rrfFuse: exact reciprocal-rank arithmetic across two lists") {
    val r1 = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val r2 = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val got = Rank.rrfFuse(Seq(r1, r2)).orderBy("doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 0.016393, 1L), (2L, 0.032522, 2L),
      (3L, 0.016129, 1L)))
  }

  test("ranked assigns 1-based ranks by score desc, id tie-break") {
    val top = Seq((5L, 2.0), (3L, 9.0), (7L, 2.0)).toDF("doc_id", "score")
    val got = Rank.ranked(top, "score").orderBy("rank")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((3L, 1), (5L, 2), (7L, 3)))
  }

  test("importanceWeights: exact add-0.5 DSIR arithmetic") {
    // V=3, nRaw=5, nTgt=3; hand-derived log-likelihood ratios
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LmScore.importanceWeights(docs, col("doc_id") === 1)
      .orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 0.1974, 3L), (2L, -0.437, 2L)))
  }

  test("importanceWeights ranks target-looking docs above off-domain") {
    // target docs speak 'alpha beta'; candidate 3 echoes the target
    // vocabulary, candidate 4 is pure off-domain
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta alpha beta"),
      (3L, "alpha beta gamma"), (4L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val w = LmScore.importanceWeights(docs, col("doc_id") <= 2)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(w(3L) > w(4L), s"in-domain ${w(3L)} must beat off-domain ${w(4L)}")
  }

  test("importanceWeights rejects an empty target") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      LmScore.importanceWeights(docs, col("doc_id") === 99).collect())
  }

  test("bm25 on an empty corpus returns an empty result, not a crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Rank.bm25(empty, Seq("a"))
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("doc_id", "score"))
  }

  test("importanceWeights rejects an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      LmScore.importanceWeights(empty, col("doc_id") >= 0).collect())
  }
}
