package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Subword tokenizer semantics: greedy longest-match walk arithmetic,
  * vocab-build counting and tie-break, and the per-doc stats contract
  * (q262's oracle replays the same chain in SQL — these pin the Scala
  * side on hand-computed cases the gate's synthetic corpus can't
  * isolate). */
class SubwordSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenizeWord: longest match wins at each position") {
    val v = Set("ab", "abc", "cd")
    // pos 0: 'abcd' not in v, 'abc' is -> abc; pos 3: bare 'd' fallback
    assert(Subword.tokenizeWord("abcd", v) == Seq("abc", "d"))
    // repeated pair: greedy left-to-right, no overlap
    assert(Subword.tokenizeWord("abab", v) == Seq("ab", "ab"))
  }

  test("tokenizeWord: single-char fallback keeps tokenization total") {
    assert(Subword.tokenizeWord("xyz", Set("ab")) == Seq("x", "y", "z"))
    assert(Subword.tokenizeWord("", Set("ab")) == Seq.empty)
  }

  test("tokenizeWord: a 4-gram beats its own 2-gram prefix") {
    val v = Set("ab", "abab")
    assert(Subword.tokenizeWord("ababab", v) == Seq("abab", "ab"))
  }

  test("buildVocab counts occurrences across word occurrences, ties gram-asc") {
    // 'aa' appears twice in "aaa" (positions 0,1) and twice more via the
    // repeated doc word; 'bb' once — count ordering; 'xy'/'xz' tie at 1
    // broken ascending
    val docs = Seq((1L, "aaa bb xy"), (2L, "aaa xz")).toDF("doc_id", "text")
    val v = Subword.buildVocab(docs, topK = 3).toSeq
    // grams: aaa->aa(x2 per occurrence),aaa(1 per occurrence); bb; xy; xz
    assert(v.head == "aa", s"most frequent first: $v")
    assert(v.size == 3)
  }

  test("tokenizeStats: counts, fertility, and hash on a tiny corpus") {
    // vocab topK=1 over "abab ab": grams ab(3), ba(1), aba(1), bab(1),
    // abab(1) -> top1 = ab. Tokens: doc1 'abab'->[ab,ab], 'ab'->[ab]
    val docs = Seq((7L, "abab ab")).toDF("doc_id", "text")
    val got = Subword.tokenizeStats(docs, topK = 1)
      .select("doc_id", "n_words", "n_subtok", "fertility", "subtok_hash")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    val expHash = java.security.MessageDigest.getInstance("MD5")
      .digest("ab ab ab".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == Seq((7L, 2L, 3L, 1.5, expHash)))
  }

  test("tokenizeStats: NULL or empty text degrades to zero words, never throws") {
    val docs = Seq((1L, "ab"), (2L, null), (3L, "   "))
      .toDF("doc_id", "text")
    val got = Subword.tokenizeStats(docs, topK = 1).orderBy("doc_id")
      .select("doc_id", "n_words", "n_subtok").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("tokenizeStats is whitespace-robust (multi-space, leading/trailing)") {
    val a = Subword.tokenizeStats(
      Seq((1L, "  ab   cd ")).toDF("doc_id", "text"), topK = 2)
    val b = Subword.tokenizeStats(
      Seq((1L, "ab cd")).toDF("doc_id", "text"), topK = 2)
    assert(a.drop("doc_id").collect().toSeq == b.drop("doc_id").collect().toSeq)
  }
}
