package graft.text

import graft.SparkTestBase

/** Aho–Corasick blocklist-scan semantics: all-occurrence counting
  * (overlaps and containment via output links), failure-link
  * transitions, case handling, null safety, and build-time input
  * validation. */
class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(phrases: Seq[String], text: String): Map[String, Long] = {
    val a = Blocklist.build(phrases)
    a.phrases.zip(a.countMatches(text)).filter(_._2 > 0).toMap
  }

  test("overlapping occurrences all count") {
    assert(counts(Seq("aa"), "aaaa") == Map("aa" -> 3L))
  }

  test("contained phrases count at the same positions (output links)") {
    assert(counts(Seq("ab", "b", "abab"), "abab")
      == Map("ab" -> 2L, "b" -> 2L, "abab" -> 1L))
  }

  test("failure links recover partial matches") {
    // after reading 'abc' (inside the 'abcd' branch), 'x' must fail over
    // to the 'bcx' branch and complete it
    assert(counts(Seq("abcd", "bcx"), "abcx") == Map("bcx" -> 1L))
    // and a full 'abcd' still matches with 'bcx' present
    assert(counts(Seq("abcd", "bcx"), "abcd") == Map("abcd" -> 1L))
  }

  test("matching is case-insensitive via the lowercase contract") {
    val a = Blocklist.build(Seq("Spark"))
    assert(a.countMatches("spark sparkle").sameElements(Array(2L)))
    assert(a.countMatches(null).sameElements(Array(0L)))
  }

  test("build rejects empty, blank-entry, and duplicate blocklists") {
    intercept[IllegalArgumentException](Blocklist.build(Nil))
    intercept[IllegalArgumentException](Blocklist.build(Seq("a", "")))
    intercept[IllegalArgumentException](Blocklist.build(Seq("A", "a")))
  }

  test("scan: per-doc per-phrase rows, zero-hit phrases absent, null text safe") {
    val docs = Seq((1L, "ab AB ba"), (2L, null), (3L, "zzz"))
      .toDF("doc_id", "text")
    val got = Blocklist.scan(docs, Seq("ab", "zz"))
      .orderBy("doc_id", "phrase")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ab", 2L), (3L, "zz", 2L)))
  }
}
