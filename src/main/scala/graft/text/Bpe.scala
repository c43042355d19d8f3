package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merge-rule LEARNING plus the rank-order
  * encode — the real subword pipeline (Sennrich, Haddow & Birch, ACL '16)
  * that upgrades q72's "BPE-ish regex" token counting to an actual
  * trained tokenizer.
  *
  * Training runs over the word-FREQUENCY dictionary, not the raw corpus
  * — the standard subword-nmt/fastBPE shape: one corpus-scale (word)
  * count shuffle produces a vocabulary-bounded dict (Heap's law:
  * ~10^6–10^7 entries at web scale), which is collected and the merge
  * loop runs driver-side over it. That collect is the bounded-collect
  * pattern (shard maps, centroids): bounded by VOCABULARY, never corpus
  * rows — exactly how every production BPE trainer works, because the
  * merge loop's working set IS the dict.
  *
  * Determinism: each merge picks the adjacent pair with the highest
  * frequency-weighted count, ties broken (left, right) ascending; a
  * merge pass rewrites every word left-to-right non-overlapping. Both
  * rules are exactly replayed by the q265/q266 oracles (pair counts as a
  * positional self-join; the merge pass as a recursive skip-2 walk), so
  * the TRAINER itself is oracle-gated, not just the apply.
  *
  * Encode ([[applyToWord]]) is the standard min-rank iteration:
  * repeatedly merge all occurrences of the lowest-rank pair present.
  * For shallow merge tables this equals the training segmentation
  * (pinned by spec on real corpora); pathological deep tables where a
  * later merge re-creates an earlier pair's token string can diverge —
  * the documented subword-nmt behavior, inherent to rank-order encode.
  * Encode distributes as a broadcast-ranks map projection: zero
  * shuffles.
  */
object Bpe {

  /** One learned merge: `left`+`right` fused, `count` = its
    * frequency-weighted pair count at merge time. */
  final case class Merge(left: String, right: String, count: Long)

  /** Corpus word-frequency dictionary: ONE keyed shuffle, map-side
    * combined, vocabulary-bounded output. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** The merge loop over a collected dict. Pure function — the spec
    * surface. Stops early when no adjacent pair remains.
    *
    * Incremental (fastBPE-shape) pair maintenance: pair counts and a
    * pair → words-containing-it index are built ONCE; each merge then
    * touches only the words that actually contain the merged pair —
    * subtract their old adjacencies, rewrite, add the new ones. Per
    * merge that's O(Σ|affected words|), not O(Σ|all words|): at a
    * production vocab (30 k merges over a 10⁷-entry dict) the full
    * recount is hours, the delta form minutes. Identity with the
    * recount-every-iteration reference ([[trainFromDictRecount]]) is
    * spec-pinned, and the q265/q266 oracles gate the trainer itself. */
  def trainFromDict(dict: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val words = dict.map(_._1).toArray
    val freqs = dict.map(_._2).toArray
    val segs: Array[Vector[String]] =
      words.map(_.map(_.toString).toVector)
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    // walk word wi's current adjacencies: add (or remove) its
    // frequency-weighted counts and index membership
    def account(wi: Int, add: Boolean): Unit = {
      val s = segs(wi)
      val f = if (add) freqs(wi) else -freqs(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val nv = pc.getOrElse(p, 0L) + f
        if (nv == 0L) pc.remove(p) else pc.update(p, nv)
        if (add)
          where.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += wi
        else where.get(p).foreach { ws =>
          ws -= wi
          if (ws.isEmpty) where.remove(p)
        }
        i += 1
      }
    }
    var wi = 0
    while (wi < words.length) { account(wi, add = true); wi += 1 }
    val out = Seq.newBuilder[Merge]
    var k = 0
    while (k < nMerges && pc.nonEmpty) {
      // highest count, ties (left, right) ascending — the ordering the
      // oracle's ORDER BY c DESC, l, r LIMIT 1 replays; the key is a
      // total order over distinct pairs so the argmin is unique and
      // map-iteration order can't matter
      val ((l, r), c) = pc.minBy { case ((pl, pr), pn) => (-pn, pl, pr) }
      out += Merge(l, r, c)
      val affected = where.get((l, r)).map(_.toArray.sorted)
        .getOrElse(Array.empty[Int])
      affected.foreach { ai =>
        account(ai, add = false)
        segs(ai) = mergePass(segs(ai), l, r)
        account(ai, add = true)
      }
      k += 1
    }
    out.result()
  }

  /** Reference merge loop: full pair recount every iteration — the
    * transliteration of the textbook algorithm, kept as the identity
    * oracle for the incremental [[trainFromDict]] (the spec asserts
    * they emit the same merges on the same dict). O(nMerges × Σ|word|);
    * use [[trainFromDict]] everywhere else. */
  def trainFromDictRecount(dict: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val freq = dict.toMap
    val segs = scala.collection.mutable.LinkedHashMap(
      dict.map { case (w, _) => w -> w.map(_.toString).toVector }: _*)
    val out = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (w, s) =>
        val f = freq(w)
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          pc.update(p, pc.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pc.minBy { case ((pl, pr), pn) => (-pn, pl, pr) }
        out += Merge(l, r, c)
        segs.mapValuesInPlace { (_, s) => mergePass(s, l, r) }
        k += 1
      }
    }
    out.result()
  }

  /** One merge pass: rewrite `s` left-to-right, fusing every
    * non-overlapping (l, r) adjacency (the skip-2 rule). */
  def mergePass(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` rules from the corpus: distributed dict, driver
    * merge loop (bounded by vocabulary — see object doc). */
  def train(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): Seq[Merge] =
    trainFromDict(
      wordFreq(docs, textCol).orderBy("word").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq,
      nMerges)

  /** Standard rank-order encode: repeatedly merge all occurrences of the
    * lowest-rank pair present until none qualifies. */
  def applyToWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var s = word.map(_.toString).toVector
    var done = s.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i + 1 < s.length) {
        ranks.get((s(i), s(i + 1))).foreach { rk =>
          if (rk < best) { best = rk; bl = s(i); br = s(i + 1) }
        }
        i += 1
      }
      if (bl == null) done = true
      else {
        s = mergePass(s, bl, br)
        if (s.length <= 1) done = true
      }
    }
    s
  }

  /** Learned merge table as a DataFrame: rank (1-based training order),
    * lhs, rhs, pair_count (lhs/rhs because LEFT/RIGHT are SQL
    * keywords on the oracle side). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i + 1, m.left, m.right, m.count) }
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Persist a learned merge table as a GraftTable — train once, encode
    * everywhere (the tokenizer artifact every pipeline ships alongside
    * its corpus). Rows are (rank, lhs, rhs, pair_count); the merge count
    * rides TBLPROPERTIES so a reopened table is self-describing. */
  def saveMerges(spark: SparkSession, path: String,
      merges: Seq[Merge]): graft.tables.GraftTable =
    graft.tables.GraftTable.createFrom(spark, path, mergeTable(spark, merges),
      Map("graft.bpe.nMerges" -> merges.size.toString))

  /** Reopen a persisted merge table COLD and reconstruct the ranked
    * merges in training order — no retraining, no corpus access. The
    * collect is bounded by the merge count (a tokenizer artifact is
    * thousands of rows at most). */
  def loadMerges(t: graft.tables.GraftTable): Seq[Merge] = {
    val n = t.properties.getOrElse("graft.bpe.nMerges", "-1").toInt
    val rows = t.read().orderBy("rank").collect()
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3)))
    require(n < 0 || rows.length == n,
      s"merge table declares $n merges but holds ${rows.length}")
    rows.toSeq
  }

  /** Build the word → (joined tokens, token count) segmentation cache
    * for `dict`'s words under `ranks` — the fastBPE word-cache: encode
    * each DISTINCT word once, look the rest up. Bounded by vocabulary,
    * like the dict itself. */
  def segmentationCache(dict: Seq[String],
      ranks: Map[(String, String), Int]): Map[String, (String, Int)] =
    dict.iterator.map { w =>
      val toks = applyToWord(w, ranks)
      w -> (toks.mkString(" "), toks.length)
    }.toMap

  /** Per-document token statistics under a learned merge table — the
    * q262-shaped report (n_words, n_subtok, fertility, md5 of the
    * space-joined subtoken stream), tokenizing with the rank-order
    * encode against broadcast ranks. Shuffle-free projection.
    *
    * `cacheWords = true` pre-encodes the corpus's `cacheTopK` most
    * FREQUENT distinct words once (one TakeOrdered over the word-count
    * scan + a driver-side encode of that slice) and broadcasts the
    * segmentation map beside the ranks; per-row work collapses to a
    * hash lookup with the greedy encode as the out-of-dict fallback —
    * the fastBPE word-cache shape. The cap matters at web scale: an
    * UNCAPPED Heap's-law vocabulary broadcast is GBs, while Zipf says
    * the top-K carries nearly all occurrence mass, so misses stay rare
    * and cheap. Same output for any K (spec-pinned); the A/B cost
    * curve and the knob are recorded in SCALING.md. */
  def tokenStats(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text", cacheWords: Boolean = false,
      cacheTopK: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val cache: Map[String, (String, Int)] =
      if (!cacheWords) Map.empty
      else segmentationCache(
        // ties broken by word so the cached SET is deterministic (the
        // OUTPUT is identical for any set — fallback encodes misses)
        wordFreq(docs, textCol).orderBy(desc("f"), asc("word"))
          .limit(cacheTopK).select("word").collect()
          .map(_.getString(0)).toSeq, ranks)
    val bcCache = spark.sparkContext.broadcast(cache)
    val tok = udf { (ws: Seq[String]) =>
      val rk = bc.value
      val lut = bcCache.value
      val sb = new StringBuilder
      var nTok = 0
      ws.foreach { w =>
        lut.get(w) match {
          case Some((joined, n)) =>
            if (sb.nonEmpty) sb.append(' ')
            sb.append(joined)
            nTok += n
          case None =>
            applyToWord(w, rk).foreach { t =>
              if (sb.nonEmpty) sb.append(' ')
              sb.append(t)
              nTok += 1
            }
        }
      }
      (ws.size, nTok, sb.toString)
    }
    docs
      .select(col("doc_id"),
        // coalesce: a NULL text is zero words, not a null array NPEing
        // inside the UDF
        tok(filter(split(lower(trim(coalesce(col(textCol), lit("")))),
          "\\s+"), w => length(w) > 0)).as("t"))
      .select(
        col("doc_id"),
        col("t._1").cast("long").as("n_words"),
        col("t._2").cast("long").as("n_subtok"),
        // ANSI mode: 0/0 throws, so a zero-word doc reports NULL fertility
        when(col("t._1") > 0,
          round(col("t._2").cast("double") / col("t._1") + lit(1e-9), 6))
          .as("fertility"),
        md5(col("t._3")).as("subtok_hash"))
  }
}
