package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles handles short documents") {
    val df = Seq("one two", "a b c d e f").toDF("text")
      .select(TextOps.shingles(col("text"), 5).as("sh"))
    val sizes = df.select(size(col("sh"))).collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(0, 2))
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("Hello  World", "hello world", "other")
      .toDF("text").select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("langId picks dominant stopword language, und when none") {
    val preds = Seq(
      "the cat and the dog of the house",
      "el gato y la casa de que",
      "xyzzy qwerty")
      .toDF("text").select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(preds.toSeq === Seq("en", "es", "und"))
  }

  test("exactDedup keeps lowest id per duplicate group") {
    val docs = Seq((5L, "same text"), (2L, "same  TEXT"), (9L, "unique"))
      .toDF("doc_id", "text")
    val kept = DedupOps.exactDedup(docs).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 9L))
  }

  test("minhash LSH finds the same pairs as exact jaccard on testdata") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val exact = DedupOps.jaccardPairs(docs, 5, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(docs, 5, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // testdata ships natural near-dups
  }

  test("simhash distance is zero for identical docs, small for near-dups") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words entirely here now then")).toDF("doc_id", "text")
    val sigs = DedupOps.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
  }

  test("connected components labels chains, stars, and singletons") {
    // component {1,2,3} is a chain (needs >1 propagation round), {5,6,7}
    // a star around 5, {9} a singleton
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (5L, 7L)).toDF("d1", "d2")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("doc_id")
    val reps = DedupOps.connectedComponents(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L))
  }

  test("duplicatedSpans merges overlapping windows into exact span coverage") {
    // docs 1 and 2 share a 25-token span S; window W=20 ⇒ the 6 shared
    // window starts merge into one island covering exactly 25 tokens on
    // each side; doc 3 shares nothing
    val s25 = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s25 + " " + (1 to 10).map(i => s"a$i").mkString(" ")),   // S + 10 unique
      (2L, (1 to 8).map(i => s"b$i").mkString(" ") + " " + s25),    // 8 unique + S
      (3L, (1 to 30).map(i => s"c$i").mkString(" ")))               // unrelated
      .toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, windowTokens = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((35L, 25L)))
    assert(out(2L) === ((33L, 25L)))
    assert(out(3L) === ((30L, 0L)))
  }

  test("connected components converges in O(log n) rounds on a long chain") {
    // a 50-node path is the diameter-stress case: naive min-label
    // propagation needs ~49 rounds; alternating large-star/small-star
    // must finish in O(log n) ≈ 6
    val edges = (1L until 50L).map(i => (i, i + 1)).toDF("d1", "d2")
    val nodes = (1L to 50L).toDF("doc_id")
    val (labels, rounds) = DedupOps.ccWithRounds(edges, nodes)
    val reps = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === (1L to 50L).map(_ -> 1L).toMap)
    assert(rounds <= 8, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("containmentPairs is asymmetric: prefix copy in source, not the reverse") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ") // 30 unique words
    val prefix = (1 to 12).map(i => s"w$i").mkString(" ") // first 12 words
    val other = (100 to 120).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, prefix), (3L, other))
      .toDF("doc_id", "text")
    val got = graft.text.DedupOps.containmentPairs(docs, n = 5, threshold = 0.8)
      .select("contained_id", "container_id", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    // prefix's 8 shingles all appear among base's 26 → containment 1.0;
    // base in prefix is 8/26 < 0.8; `other` shares nothing
    assert(got == Seq((2L, 1L, 1.0)))
  }

  test("containmentPairs finds mutual containment for exact duplicates") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = graft.text.DedupOps.containmentPairs(docs, n = 5, threshold = 0.8)
      .select("contained_id", "container_id", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("rejectRule fires in priority order and keeps clean docs") {
    val docs = Seq(
      (1L, "too few words"),                                    // too_short
      (2L, ("the and of to in ok " * 50).trim),                 // too_long (>500 chars)
      (3L, "the!!! and... of;;; to??? in:::,,, w1 w2 w3 w4 w5"),// high_punct
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // no_stopwords
      (5L, "the quick brown fox and the lazy dog of the north went to sleep in peace")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.rejectRule(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      1L -> "too_short", 2L -> "too_long", 3L -> "high_punct",
      4L -> "no_stopwords", 5L -> "kept"))
    // priority: a doc that is BOTH too short and punctuation-heavy
    // attributes to the first rule in the ladder
    val both = Seq((9L, "!!! ??? ...")).toDF("doc_id", "text")
      .select(TextOps.rejectRule(col("text"))).head().getString(0)
    assert(both == "too_short")
  }

  test("fingerprintProbe is strictly batch-vs-corpus: no self pairs on either side") {
    import spark.implicits._
    // batch 1 (0b00) and 3 (0b11) are hamming 2 of EACH OTHER — a
    // symmetric join would pair them; corpus 10 (0b00) and 12 (0b01)
    // are hamming 1 of each other — a corpus self-join would pair
    // those. Only cross pairs may come back.
    val batch = Seq((1L, 0L), (2L, 0xFFL), (3L, 3L)).toDF("id", "h")
    val corpus = Seq((10L, 0L), (11L, 0xFF00L), (12L, 1L)).toDF("id", "h")
    val got = DedupOps.fingerprintProbe(batch, corpus, "id", "h", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(got === Set((1L, 10L, 0L), (1L, 12L, 1L), (3L, 10L, 2L), (3L, 12L, 1L)))
    // the dedup consumer's view: batch 2 has no corpus neighbor ≤ 2
    val losers = got.map(_._1)
    assert(!losers.contains(2L) && losers === Set(1L, 3L))
    intercept[IllegalArgumentException](
      DedupOps.fingerprintProbe(batch, corpus, "id", "h", maxHamming = 9))
  }

  test("cleanText: tag strip, NFC compose, control chars, collapse, trim") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "<p id=\"x\">a b</p>"),          // tags out
      (2L, "cafe\u0301"),                    // decomposed -> precomposed
      (3L, "a\tb\u0001c"),                  // controls become spaces
      (4L, "  a   b  "),                      // collapse + trim
      (5L, null)                              // null stays null
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextOps.cleanText(col("t")).as("c"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got(0) == "a b")
    assert(got(1) == "caf\u00e9" && got(1).length == 4)
    assert(got(2) == "a b c")
    assert(got(3) == "a b")
    assert(got(4) == null)
  }

  test("charEntropy: hand-computed bits, degenerate and null inputs") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"),
      (4L, null), (5L, "")).toDF("id", "t")
    val got = rows.select(col("id"), TextOps.charEntropy(col("t")).as("e"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(math.round(r.getDouble(1) * 1e9) / 1e9))
    assert(got(0).contains(1.0) && got(1).contains(2.0) && got(2).contains(0.0))
    assert(got(3).isEmpty && got(4).isEmpty)
  }

  test("nfc/charEntropy columns analyze in a session other than the builder's") {
    // the expression-bridge regression (review finding): the old
    // registry route registered the temp function on SparkSession.active,
    // so a Column built under one session failed unresolved when a
    // DIFFERENT session analyzed it. newSession() shares nothing but the
    // SparkContext — including not the function registry.
    val col1 = TextOps.nfc(col("t"))
    val col2 = TextOps.charEntropy(col("t"))
    val other = spark.newSession()
    import other.implicits._
    val got = Seq("éclair").toDF("t")
      .select(col1.as("n"), col2.as("e")).head()
    assert(got.getString(0) == "éclair", "NFC must compose in the foreign session")
    assert(!got.isNullAt(1))
  }

  test("bagFingerprint: permutation-invariant, multiset-sensitive, space-robust") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "x y z"), (2L, "z  x y "), (3L, "x x y"),
      (4L, "x y y")).toDF("id", "t")
    val fp = rows.select(col("id"), TextOps.bagFingerprint(col("t")).as("f"))
      .orderBy("id").collect().map(_.getString(1))
    assert(fp(0) == fp(1), "permutation + whitespace must not change the bag")
    assert(fp(2) != fp(3), "duplicate words are part of the multiset")
    assert(fp(0) != fp(2))
  }
}
