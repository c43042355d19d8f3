package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist / contaminant phrase scan via a broadcast Aho–Corasick
  * automaton (Aho & Corasick, CACM '75) — the filter stage every
  * crawl-curation pipeline runs against word/phrase blocklists, and the
  * brute-force cousin q263's positional join can't serve once the list
  * grows: a positional probe does one join leg per phrase WORD, while
  * the automaton matches EVERY phrase in one left-to-right pass, O(|text|
  * + matches) per document REGARDLESS of blocklist size.
  *
  * Semantics: case-insensitive substring matching over the trimmed
  * lowercased text; ALL occurrences count, including overlapping ones
  * and phrases contained in longer phrases (the automaton's output
  * links) — exactly the position-enumeration the q268 oracle replays in
  * SQL, so the fail/output-link construction itself is oracle-gated.
  *
  * Scale shape: the automaton is built driver-side from the blocklist
  * (bounded by total phrase characters — a blocklist is metadata, never
  * corpus-scale) and broadcast; the scan is a shuffle-free projection.
  */
object Blocklist {

  /** Immutable matching automaton. Node 0 is the root; the goto
    * function is per-node SORTED parallel arrays (`gotoKeys` chars /
    * `gotoTo` targets, binary-searched) — primitive array probes on the
    * per-character hot path, where a boxed `Map[Char, Int]` lookup was
    * a measured few-× constant-factor tax (ProfAc, m1000 corpus).
    * `fail` holds the failure links, `out` the phrase indices
    * recognized at each node (own + inherited through failure links,
    * pre-flattened at build time so matching never walks the fail
    * chain). */
  final class Automaton private[Blocklist] (
      val phrases: Array[String],
      gotoKeys: Array[Array[Char]],
      gotoTo: Array[Array[Int]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** goto(s, c): binary search the node's sorted key array; -1 = no
      * edge. Branching per node is alphabet-bounded and typically tiny,
      * so the search is 1–6 primitive compares, no boxing. */
    private def goTo(s: Int, c: Char): Int = {
      val ks = gotoKeys(s)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = ks(mid)
        if (k == c) return gotoTo(s)(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** All-occurrence counts per phrase index over `text` (lowercased by
      * the caller contract). Null-safe: null counts as empty. */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](phrases.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        // follow failure links until a goto exists (root loops to itself)
        var t = goTo(s, c)
        while (s != 0 && t < 0) { s = fail(s); t = goTo(s, c) }
        s = if (t < 0) 0 else t
        val o = out(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton from `phrases` (lowercased, distinct, order
    * preserved; empties rejected — an empty needle matches everywhere
    * and means a broken blocklist). */
  def build(phrases: Seq[String]): Automaton = {
    val ps = phrases.map(_.toLowerCase).toArray
    require(ps.nonEmpty, "blocklist must be non-empty")
    require(ps.forall(_.nonEmpty), "blocklist phrases must be non-empty")
    require(ps.distinct.length == ps.length, "blocklist phrases must be distinct")
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    ps.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        next(s).get(c) match {
          case Some(t) => s = t
          case None =>
            next += Map.empty[Char, Int]
            ownOut += Nil
            next(s) = next(s) + (c -> (next.length - 1))
            s = next.length - 1
        }
      }
      ownOut(s) = pi :: ownOut(s)
    }
    // failure links by BFS; output links flattened as we go (a node's
    // full output = own + fail target's full output, and BFS order
    // guarantees the fail target is already flattened)
    val n = next.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    val visited = scala.collection.mutable.Set(0) ++ next(0).values
    queue.foreach(s => out(s) = (ownOut(s) ++ out(fail(s))).toArray)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      if (out(u) == null) out(u) = (ownOut(u) ++ out(fail(u))).toArray
      next(u).foreach { case (c, v) =>
        if (!visited.contains(v)) {
          var f = fail(u)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          fail(v) = next(f).getOrElse(c, 0) match {
            case t if t == v => 0 // self via root goto: fail to root
            case t => t
          }
          out(v) = (ownOut(v) ++ out(fail(v))).toArray
          visited += v
          queue += v
        }
      }
    }
    // freeze the build-time char maps into sorted parallel arrays (the
    // match-time representation; the trie/BFS above stays map-based for
    // clarity — build cost is blocklist-metadata-scale, match cost is
    // corpus-scale)
    val gotoKeys = next.map(_.keysIterator.toArray.sorted).toArray
    val gotoTo = Array.tabulate(n)(s => gotoKeys(s).map(next(s)))
    new Automaton(ps, gotoKeys, gotoTo, fail, out)
  }

  /** Total blocklist hits per row as a scalar column — the filter-stage
    * form (`hitCount(...) === 0` keeps a doc). Same automaton, same
    * all-occurrence, case-insensitive semantics as [[scan]]: the input
    * is lowercased/trimmed here so a capitalized occurrence can't slip
    * past the lowercased automaton. Zero shuffle. */
  def hitCount(text: org.apache.spark.sql.Column,
      phrases: Seq[String],
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Column = {
    val bc = spark.sparkContext.broadcast(build(phrases))
    val f = udf { (s: String) => bc.value.countMatches(s).sum }
    f(lower(trim(coalesce(text, lit("")))))
  }

  /** Per-(doc, phrase) all-occurrence hit counts over the corpus; rows
    * only for phrases that hit. Output: idCol, phrase, n_hits. One
    * shuffle-free scan projection + explode. */
  def scan(docs: DataFrame, phrases: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(build(phrases))
    val hits = udf { (text: String) =>
      val a = bc.value
      val counts = a.countMatches(text)
      counts.iterator.zipWithIndex.collect {
        case (c, i) if c > 0 => (a.phrases(i), c)
      }.toSeq
    }
    docs
      .select(col(idCol),
        explode(hits(lower(trim(coalesce(col(textCol), lit("")))))).as("h"))
      .select(col(idCol), col("h._1").as("phrase"), col("h._2").as("n_hits"))
  }
}
