package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CorpusOps semantics against single-partition references: the
  * distributed prefix-sum packing must equal a global-window computation,
  * stratified sampling must be deterministic and type-agnostic in the id,
  * vocabulary coverage must rank/accumulate correctly. */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("packSequences equals the single-partition prefix sum") {
    val docs = (1L to 500L).map(i => (i, (i % 7 + 1).toInt)).toDF("doc_id", "n_tokens")
    val got = CorpusOps.packSequences(docs, capacity = 64)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect()
    // reference: plain Scala running sum
    var cum = 0L
    val want = (1L to 500L).map { i =>
      val n = (i % 7 + 1)
      val start = cum; cum += n
      (i, start, start / 64, (start + n - 1) / 64, (start + n - 1) / 64 - start / 64 + 1)
    }
    assert(got.toSeq == want)
  }

  test("packSequences spans are contiguous and cover the whole stream") {
    val docs = (1L to 200L).map(i => (i, 5)).toDF("doc_id", "n_tokens")
    val rows = CorpusOps.packSequences(docs, capacity = 17)
      .orderBy("doc_id").select("tok_start", "n_tokens")
      .as[(Long, Long)].collect()
    rows.foldLeft(0L) { case (expect, (start, n)) =>
      assert(start == expect); start + n
    }
  }

  test("stratifiedSample keeps ceil(fraction*n) per stratum, deterministically") {
    val docs = (1L to 300L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val a = CorpusOps.stratifiedSample(docs, "lang", 0.1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusOps.stratifiedSample(docs, "lang", 0.1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "hash-ranked sample must be reproducible")
    val perStratum = CorpusOps.stratifiedSample(docs, "lang", 0.1)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.toSet == Set(10L)) // ceil(100 * 0.1)
  }

  test("stratifiedSample works with string ids (regression: numeric-only hash)") {
    val docs = (1 to 90).map(i => (s"doc-${java.util.UUID.nameUUIDFromBytes(Array(i.toByte))}-$i", s"s${i % 2}"))
      .toDF("doc_id", "stratum")
    val sampled = CorpusOps.stratifiedSample(docs, "stratum", 0.2, idCol = "doc_id")
    val n = sampled.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(n == Map("s0" -> 9L, "s1" -> 9L)) // ceil(45 * 0.2)
    // a NULL hash would have selected the first rows by id order for every
    // stratum AND still passed the count check — assert ranks are hash-driven
    val ranked = sampled.select("doc_id", "sample_rank").collect()
    assert(ranked.forall(_.get(1) != null))
  }

  test("vocabCoverage ranks by frequency with correct cumulative share") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d"),
      (3L, "a c")).toDF("doc_id", "text")
    // counts: a=5, b=3, c=2, d=1 → total 11
    val got = CorpusOps.vocabCoverage(docs, "text", topK = 3)
      .orderBy("rank")
      .select("word", "n", "rank", "cum_share")
      .as[(String, Long, Int, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 2L, 3)))
    assert(math.abs(got(0)._4 - 5.0 / 11) < 1e-4)
    assert(math.abs(got(2)._4 - 10.0 / 11) < 1e-4)
  }

  test("vocabCoverage: no single-partition exchange over the vocabulary") {
    // the vocabulary-scale work must be a distributed top-K
    // (TakeOrderedAndProject: per-partition top-K merged on the driver),
    // never a global window pulling the whole vocabulary — 1e8 types at
    // web scale — through one task; the same counts + orderBy + limit
    // shape vocabCoverage builds internally is pinned here
    val docs = Seq((1L, "a a b c d e f g h i j k"), (2L, "a b c z y x"))
      .toDF("doc_id", "text")
    val topkPlan = docs
      .select(explode(graft.text.TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(5)
      .queryExecution.executedPlan.toString
    assert(topkPlan.contains("TakeOrderedAndProject"),
      s"top-K must be TakeOrderedAndProject, got:\n$topkPlan")
    assert(!topkPlan.toLowerCase.contains("singlepartition"),
      s"single-partition exchange over the vocabulary:\n$topkPlan")
    // and the operator's own output contains no corpus-side lineage (it
    // is materialized, so the persisted vocab cache can be released)
    val out = CorpusOps.vocabCoverage(docs, "text", topK = 5)
    assert(out.queryExecution.executedPlan.toString.contains("Scan ExistingRDD")
      || out.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "output should be materialized, not re-derive the corpus scan")
  }

  test("vocabCoverage: rank and cum_share exact across bucket boundaries") {
    // many distinct types + a tiny shuffle width force multi-row buckets
    // so the cross-bucket offsets are actually exercised
    val words = (1 to 200).map(i => s"w$i")
    // word wI appears (201-i) times → rank i is wI, strictly decreasing n
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(201 - (i + 1))(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = CorpusOps.vocabCoverage(docs, "text", topK = 200)
      .orderBy("rank").as[(String, Long, Int, Double)].collect().toSeq
    assert(got.map(_._3) == (1 to 200))
    assert(got.map(_._1) == words)
    val total = (1 to 200).map(i => 201 - i).sum.toDouble
    var cum = 0L
    got.foreach { case (_, n, rank, share) =>
      cum += n
      assert(math.abs(share - cum / total) < 1e-4,
        s"cum_share wrong at rank $rank")
    }
  }

  private def chunkRows(text: String, window: Int, stride: Int) =
    CorpusOps.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_start", "n_chunk_tokens")
      .as[(Int, Int, Int)].collect().toSeq

  test("chunkTokens: short doc yields one full-length chunk") {
    assert(chunkRows("a b c", window = 20, stride = 15) == Seq((0, 0, 3)))
    assert(chunkRows(Seq.fill(20)("t").mkString(" "), 20, 15) == Seq((0, 0, 20)))
  }

  test("chunkTokens: tail chunk kept short, never dropped") {
    // 21 tokens, window 20, stride 15 → chunks [0,20) and [15,21)
    assert(chunkRows(Seq.fill(21)("t").mkString(" "), 20, 15) ==
      Seq((0, 0, 20), (1, 15, 6)))
    // 50 tokens → ceil((50-20)/15)+1 = 3 starts 0,15,30; the last window
    // [30,50) is exactly full and already reaches the end — no 4th chunk
    assert(chunkRows(Seq.fill(50)("t").mkString(" "), 20, 15) ==
      Seq((0, 0, 20), (1, 15, 20), (2, 30, 20)))
    // 52 tokens → starts 0,15,30,45; short tail [45,52)
    assert(chunkRows(Seq.fill(52)("t").mkString(" "), 20, 15) ==
      Seq((0, 0, 20), (1, 15, 20), (2, 30, 20), (3, 45, 7)))
  }

  test("chunkTokens: consecutive chunks overlap by window - stride and cover every token") {
    val n = 137
    val rows = chunkRows((0 until n).map("w" + _).mkString(" "), 20, 15)
    rows.sliding(2).foreach {
      case Seq((_, s1, len1), (_, s2, _)) =>
        assert(s2 == s1 + 15)
        assert(s1 + len1 >= s2) // overlap, no gap
      case _ =>
    }
    val (_, lastStart, lastLen) = rows.last
    assert(lastStart + lastLen == n)
  }

  test("chunkTokens: chunk hashes pin the window content") {
    val text = (0 until 40).map("w" + _).mkString(" ")
    val got = CorpusOps.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), 20, 15)
      .orderBy("chunk_idx").select("chunk_hash").as[String].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val toks = text.split("\\s+")
    assert(got(0) == md5hex(toks.slice(0, 20).mkString(" ")))
    assert(got(1) == md5hex(toks.slice(15, 35).mkString(" ")))
    assert(got(2) == md5hex(toks.slice(30, 40).mkString(" ")))
  }

  private def knuth(id: Long): Long = (id * 2654435761L) % 4294967296L

  test("sampleToBudget stops at the budget line, keeping the crossing doc") {
    val docs = (1L to 6L).map(i => (i, "a", ("t " * 10).trim))
      .toDF("doc_id", "lang", "text")
    val budgets = Seq(("a", 25L)).toDF("lang", "budget")
    val got = CorpusOps.sampleToBudget(docs, budgets)
      .orderBy("cum_tokens").select("doc_id", "cum_tokens")
      .as[(Long, Long)].collect().toSeq
    // 10-token docs in scrambled-id order: cum 10, 20, 30 — the doc that
    // crosses the 25-token line is kept, the rest are not
    val order = (1L to 6L).sortBy(i => (knuth(i), i))
    assert(got.map(_._1) == order.take(3))
    assert(got.map(_._2) == Seq(10L, 20L, 30L))
  }

  test("sampleToBudget keeps every doc when the domain exhausts before budget") {
    val docs = (1L to 4L).map(i => (i, "a", "w1 w2 w3"))
      .toDF("doc_id", "lang", "text")
    val budgets = Seq(("a", 1000L)).toDF("lang", "budget")
    assert(CorpusOps.sampleToBudget(docs, budgets).count() == 4)
  }

  test("sampleToBudget drops domains without a budget row and isolates domains") {
    val docs = ((1L to 4L).map(i => (i, "en", "a b c")) ++
      (5L to 8L).map(i => (i, "de", "x y z"))).toDF("doc_id", "lang", "text")
    val budgets = Seq(("en", 7L)).toDF("lang", "budget")
    val got = CorpusOps.sampleToBudget(docs, budgets)
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    assert(got.forall(_._2 == "en"))
    // 3-token docs, budget 7 → cum 3, 6, 9: three kept (9 crosses), one not
    assert(got.size == 3)
    val order = (1L to 4L).sortBy(i => (knuth(i), i))
    assert(got.map(_._1).toSet == order.take(3).toSet)
  }

  test("chunkTokens rejects invalid window/stride") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](CorpusOps.chunkTokens(df, 0, 1))
    intercept[IllegalArgumentException](CorpusOps.chunkTokens(df, 10, 11))
    intercept[IllegalArgumentException](CorpusOps.chunkTokens(df, 10, 0))
  }

  test("corpusHealth: hand-computed counts, slope, and percentiles") {
    // en: counts a:5 b:3 c:1 -> ranks 1,2,3; OLS of ln(n) on ln(rank)
    // over [(0, ln5), (ln2, ln3), (ln3, 0)] = -1.3866 (4-dp).
    // doc lengths [7, 2]: quantile_cont p50 = 2 + 0.5*(7-2) = 4.5,
    // p95 = 2 + 0.95*5 = 6.75.
    val docs = Seq(
      (1L, "en", "a a a a b b c"),
      (2L, "en", "a b")).toDF("doc_id", "lang", "text")
    val got = CorpusOps.corpusHealth(docs)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(("en", 9L, 3L, 0.333333, -1.3866, 4.5, 6.75)))
  }

  test("weightedSample: local replay of the race keys picks the same set") {
    val docs = (1L to 200L).map(i => (i, (i % 13 + 1).toInt))
      .toDF("doc_id", "w")
    val got = CorpusOps.weightedSample(docs, "w", 20)
      .select("doc_id").as[Long].collect().toSet
    // reference: exact same md5-derived u and key in local Scala
    def key(id: Long, w: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.log(u) / w
    }
    val want = (1L to 200L).map(i => i -> key(i, (i % 13 + 1).toInt))
      .sortBy { case (id, k) => (-k, id) }.take(20).map(_._1).toSet
    assert(got == want)
  }

  test("weightedSample: zero/negative/null weights are excluded; heavier wins more often") {
    val docs = Seq((1L, 0.0), (2L, -3.0), (4L, 1.0)).toDF("doc_id", "w")
      .unionByName(Seq((3L, Option.empty[Double])).toDF("doc_id", "w"))
    val got = CorpusOps.weightedSample(docs, "w", 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(4L), "only the positive-weight row may be drawn")
    // proportionality smoke: weight 1000 vs 1 over many ids — the heavy
    // class must dominate a k=100 sample
    val mixed = (1L to 1000L).map(i =>
      (i, if (i <= 500) 1000.0 else 1.0)).toDF("doc_id", "w")
    val heavy = CorpusOps.weightedSample(mixed, "w", 100)
      .filter(col("doc_id") <= 500).count()
    assert(heavy >= 90, s"expected the 1000x class to dominate, got $heavy/100")
  }

  test("qualityCutoff: crossing point, budget-over-total clamp, and exact-boundary fencepost") {
    // buckets: score 0.9 (2 docs, 40 tok), 0.5 (1 doc, 50 tok), 0.1 (1 doc, 10 tok)
    val docs = Seq((0.9, 25L), (0.9, 15L), (0.5, 50L), (0.1, 10L))
      .toDF("q", "ntok")
    def cut(budget: Long) = CorpusOps.qualityCutoff(docs, "q", "ntok", budget)
      .as[(Double, Long, Long, Long)].head()
    assert(cut(30) == ((0.9, 2L, 40L, 100L)), "inside the top bucket")
    assert(cut(40) == ((0.9, 2L, 40L, 100L)), "exact boundary keeps the higher cutoff")
    assert(cut(41) == ((0.5, 3L, 90L, 100L)), "one past the boundary descends")
    assert(cut(500) == ((0.1, 4L, 100L, 100L)), "budget over total keeps everything")
  }

  test("corpusHealth: domains are independent and rank ties break word-asc") {
    // fr: 'x' and 'y' tie at 2 -> ranks by word asc (x=1, y=2); the
    // slope over equal counts is exactly 0 regardless of rank order
    val docs = Seq(
      (1L, "fr", "x y x y"),
      (2L, "de", "z")).toDF("doc_id", "lang", "text")
    val got = CorpusOps.corpusHealth(docs).orderBy("lang").collect()
    // de: a single rank point -> regr_slope is NULL (var_pop(x) = 0) on
    // both engines; assert fr exactly, de's non-slope fields
    assert(got.map(_.getString(0)).toSeq == Seq("de", "fr"))
    val fr = got(1)
    assert((fr.getLong(1), fr.getLong(2), fr.getDouble(3), fr.getDouble(4),
      fr.getDouble(5), fr.getDouble(6)) == ((4L, 2L, 0.5, 0.0, 4.0, 4.0)))
    val de = got(0)
    assert(de.isNullAt(4), "single-rank slope must be NULL")
    assert((de.getLong(1), de.getLong(2), de.getDouble(3), de.getDouble(5),
      de.getDouble(6)) == ((1L, 1L, 1.0, 1.0, 1.0)))
  }
}
