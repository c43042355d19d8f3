package graft.text

import graft.SparkTestBase

/** BPE trainer + encode semantics on hand-computed dictionaries: pair
  * counting weighted by word frequency, the deterministic argmax, the
  * left-to-right skip-2 merge pass (overlap handling), early exhaustion,
  * rank-order encode, and encode == training segmentation on a real
  * corpus slice (the q266 contract). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._
  import Bpe._

  test("trainFromDict: frequency-weighted counts pick the heavy pair") {
    // 'ab' x5 -> (a,b)=5; 'cd' x3 -> (c,d)=3
    val m = trainFromDict(Seq("ab" -> 5L, "cd" -> 3L), 2)
    assert(m == Seq(Merge("a", "b", 5), Merge("c", "d", 3)))
  }

  test("trainFromDict: overlapping pairs count every adjacency") {
    // 'aaa' x1: (a,a) counted at positions 0 and 1 -> 2
    val m = trainFromDict(Seq("aaa" -> 1L), 1)
    assert(m == Seq(Merge("a", "a", 2)))
  }

  test("trainFromDict: ties break (left, right) ascending") {
    // (b,a) and (a,b) both count 2: 'ba' x2, 'ab' x2 -> (a,b) wins
    val m = trainFromDict(Seq("ba" -> 2L, "ab" -> 2L), 1)
    assert(m.head == Merge("a", "b", 2))
  }

  test("trainFromDict: merge pass is left-to-right non-overlapping") {
    // after merging (a,a) on 'aaa': [aa, a]; second merge is (aa, a)
    val m = trainFromDict(Seq("aaa" -> 1L), 2)
    assert(m == Seq(Merge("a", "a", 2), Merge("aa", "a", 1)))
  }

  test("trainFromDict: exhausts early when no pairs remain") {
    val m = trainFromDict(Seq("ab" -> 1L), 10)
    // merge 1 fuses the only pair; merge 2 finds single-token words only
    assert(m == Seq(Merge("a", "b", 1)))
    assert(trainFromDict(Seq("a" -> 5L), 3).isEmpty)
  }

  test("incremental trainer is merge-for-merge identical to the full recount") {
    // hand cases covering overlap, ties, exhaustion, shared subwords
    val dicts = Seq(
      Seq("ab" -> 5L, "cd" -> 3L),
      Seq("aaa" -> 1L),
      Seq("ba" -> 2L, "ab" -> 2L),
      Seq("abab" -> 4L, "abc" -> 2L, "bca" -> 7L, "a" -> 1L),
      Seq("xxyxx" -> 3L, "xyx" -> 5L, "yy" -> 2L))
    dicts.foreach { d =>
      assert(trainFromDict(d, 10) == trainFromDictRecount(d, 10),
        s"divergence on $d")
    }
    // plus the real sf0.001 dict, deep merge table (past exhaustion
    // of the easy pairs, where stale-count bugs surface)
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dict = Bpe.wordFreq(docs).orderBy("word").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(trainFromDict(dict, 60) == trainFromDictRecount(dict, 60))
  }

  test("mergePass: skip-2 on 'aaaa' leaves no stranded pair") {
    assert(mergePass(Vector("a", "a", "a", "a"), "a", "a")
      == Vector("aa", "aa"))
    assert(mergePass(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
  }

  test("applyToWord: min-rank pair merges before a higher rank") {
    // ranks: (b,c)=0, (a,b)=1; 'abc' must become [a, bc], never [ab, c]
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(applyToWord("abc", ranks) == Vector("a", "bc"))
    assert(applyToWord("x", ranks) == Vector("x"))
    assert(applyToWord("", ranks) == Vector.empty)
  }

  test("encode equals the training segmentation on a corpus slice (q266 contract)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dict = Bpe.wordFreq(docs).orderBy("word").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = trainFromDict(dict, 8)
    assert(merges.size == 8)
    val ranks = merges.zipWithIndex
      .map { case (m, i) => (m.left, m.right) -> i }.toMap
    // replay training on the dict and compare word by word
    var segs = dict.map { case (w, _) => w -> w.map(_.toString).toVector }
    merges.foreach { m =>
      segs = segs.map { case (w, s) => w -> mergePass(s, m.left, m.right) }
    }
    segs.foreach { case (w, trained) =>
      assert(applyToWord(w, ranks) == trained,
        s"encode/training divergence on '$w'")
    }
  }

  test("tokenStats: NULL or blank text degrades to zero words, never throws") {
    val got = Bpe.tokenStats(
        Seq((1L, null), (2L, " ")).toDF("doc_id", "text"),
        Seq(Merge("a", "b", 1L)))
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_subtok").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }

  test("saveMerges/loadMerges round-trips ranks, pairs, and counts cold") {
    val merges = Seq(Merge("a", "b", 5L), Merge("ab", "c", 3L),
      Merge("x", "y", 2L))
    val path = scratch("bpe_rt")
    Bpe.saveMerges(spark, path, merges)
    // reopen through a FRESH handle — nothing cached from the save
    val loaded = Bpe.loadMerges(graft.tables.GraftTable.load(spark, path))
    assert(loaded == merges)
    // a table whose declared merge count disagrees with its rows fails
    val t2 = graft.tables.GraftTable.createFrom(spark, scratch("bpe_bad"),
      Bpe.mergeTable(spark, merges), Map("graft.bpe.nMerges" -> "7"))
    intercept[IllegalArgumentException](Bpe.loadMerges(t2))
  }

  test("word-cache encode path is output-identical to the direct path") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.train(docs, nMerges = 5)
    val direct = Bpe.tokenStats(docs, merges).orderBy("doc_id").collect()
    val cached = Bpe.tokenStats(docs, merges, cacheWords = true)
      .orderBy("doc_id").collect()
    assert(direct.toSeq == cached.toSeq)
    // a cap SMALLER than the vocabulary must not change the output —
    // out-of-cache words take the fallback encode (cap = 50 on a
    // ~1k-word dict forces plenty of misses)
    val capped = Bpe.tokenStats(docs, merges, cacheWords = true,
        cacheTopK = 50)
      .orderBy("doc_id").collect()
    assert(direct.toSeq == capped.toSeq)
  }

  test("segmentationCache entries agree with the greedy encode per word") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    val cache = Bpe.segmentationCache(Seq("abc", "abab", "x"), ranks)
    assert(cache("abc") == (("abc", 1)))
    assert(cache("abab") == (("ab ab", 2)))
    assert(cache("x") == (("x", 1)))
    // an out-of-cache word takes the same encode the cache was built
    // with — the UDF's fallback branch is this exact call
    assert(Bpe.applyToWord("abcc", ranks) == Vector("abc", "c"))
  }

  test("tokenStats: counts and hash under a fixed merge table") {
    val merges = Seq(Merge("a", "b", 99L))
    val got = Bpe.tokenStats(Seq((1L, "abab ab x")).toDF("doc_id", "text"),
        merges)
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    // abab -> [ab, ab]; ab -> [ab]; x -> [x]: 3 words, 4 subtokens
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("ab ab ab x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == Seq((1L, 3L, 4L, 1.333333, exp)))
  }
}
