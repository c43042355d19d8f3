package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Positional-index phrase-scan semantics: posting positions, exact
  * adjacency (including overlapping occurrences), cross-document
  * counting, and the deterministic phrase-extraction contract. */
class PhraseIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("postings: 0-based word positions, whitespace-robust") {
    val got = PhraseIndex.postings(
        Seq((1L, "  Alpha  beta   alpha ")).toDF("doc_id", "text"))
      .orderBy("pos").as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 0, "alpha"), (1L, 1, "beta"), (1L, 2, "alpha")))
  }

  test("phraseScan: overlapping occurrences both count") {
    // "x x x x" contains "x x x" at pos 0 and pos 1
    val docs = Seq((1L, "x x x x"), (2L, "x y x x x")).toDF("doc_id", "text")
    val phrases = Seq((9L, "x", "x", "x", "x x x"))
      .toDF("phrase_doc", "w1", "w2", "w3", "phrase")
    val got = PhraseIndex.phraseScan(docs, phrases)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // doc1: 2 hits; doc2: 1 hit (pos 2) -> 2 docs, 3 hits, first doc 1
    assert(got == Seq((9L, "x x x", 2L, 3L, 1L)))
  }

  test("phraseScan: adjacency is exact — gapped or reordered words do not match") {
    val docs = Seq((1L, "a b c"), (2L, "a x b c"), (3L, "c b a"))
      .toDF("doc_id", "text")
    val phrases = Seq((9L, "a", "b", "c", "a b c"))
      .toDF("phrase_doc", "w1", "w2", "w3", "phrase")
    val got = PhraseIndex.phraseScan(docs, phrases)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, "a b c", 1L, 1L, 1L)))
  }

  test("phraseScan: a phrase crossing a doc boundary never matches") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val phrases = Seq((9L, "a", "b", "c", "a b c"))
      .toDF("phrase_doc", "w1", "w2", "w3", "phrase")
    assert(PhraseIndex.phraseScan(docs, phrases).isEmpty)
  }

  test("phrasesFromDocs: words 4..6 of ids matching the residue") {
    val docs = Seq(
      (3L, "w0 w1 w2 w3 w4 w5 w6"),
      (4L, "a b c d e f")).toDF("doc_id", "text")
    val got = PhraseIndex.phrasesFromDocs(docs, every = 100, residue = 3)
      .select("phrase_doc", "phrase").as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "w3 w4 w5")))
  }
}
