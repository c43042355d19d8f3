package graft.text

import graft.SparkTestBase

/** LmScore semantics: exact smoothed-bigram arithmetic on a tiny corpus,
  * the rare-transition ordering property, and edge contracts. */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramSurprisal: exact add-0.5 arithmetic on a tiny corpus") {
    // vocab {a, b, x} → V = 3; c(a,b)=3, c(b,a)=1, c(a·)=3, c(b·)=1
    // P(b|a) = 3.5/4.5 → −log₂ = 0.362570; P(a|b) = 1.5/2.5 = 0.6 →
    // −log₂ = 0.736966; doc1 mean over (ab, ba, ab), doc2 over (ab);
    // the 1-token doc has no bigrams and is absent
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = LmScore.bigramSurprisal(docs).orderBy("doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 0.4874, 3L), (2L, 0.3626, 1L)))
  }

  test("bigramSurprisal ranks scrambled text above fluent corpus text") {
    val fluent = "the quick brown fox jumps over the lazy dog"
    val docs = (1L to 9L).map(i => (i, fluent)) :+
      (10L, "dog the over quick lazy jumps brown fox the")
    val got = LmScore.bigramSurprisal(docs.toDF("doc_id", "text"))
      .select("doc_id", "surprisal").as[(Long, Double)].collect().toMap
    assert(got(10L) > got(1L),
      s"scramble ${got(10L)} must out-surprise fluent ${got(1L)}")
  }

  test("bigramSurprisal rejects non-positive alpha") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](LmScore.bigramSurprisal(docs, alpha = 0))
  }
}
