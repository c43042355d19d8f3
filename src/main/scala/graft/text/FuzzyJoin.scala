package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-level fuzzy matching: all pairs within edit distance `k`
  * (record linkage / title dedup — the character-granular complement to
  * the token-level Jaccard family in [[DedupOps]]).
  *
  * Candidate generation uses segment (pigeonhole) filtering, the PassJoin
  * idea (Li, Deng, Feng — VLDB '11): split every indexed string into
  * k+1 contiguous segments; if ed(a, b) ≤ k then b contains at least one
  * of a's segments EXACTLY, shifted by at most k positions. Candidates
  * are therefore an equi-join on (segment text, segment index, indexed
  * length) between indexed segments and probe substrings — never an
  * all-pairs product — and exact `levenshtein` verification removes the
  * false positives. Probe fan-out is bounded: (2k+1)·(k+1) substrings
  * per candidate length, lengths within ±k, so ~O(k³) emitted rows per
  * string, independent of corpus size.
  *
  * Scale shape: two keyed shuffles (the segment equi-join, the pair
  * distinct) plus a per-pair verification projection — the classic
  * inverted-index discipline, with hot segments bounded by segment
  * length (longer segments ⇒ rarer). Exact: the pigeonhole lemma has no
  * false negatives, and verification has no false positives.
  */
object FuzzyJoin {

  /** Segment start offset for segment `i` of a length-`l` string split
    * into k+1 even parts (0-based; matches `floor(i*l/(k+1))`). */
  private def segStart(i: Column, l: Column, k: Int): Column =
    floor(i * l / (k + 1)).cast("int")

  /** All (id, strCol) pairs with levenshtein ≤ k and id1 < id2. Strings
    * must be non-null; empty strings match anything within length k. */
  def selfPairs(df: DataFrame, k: Int,
      idCol: String = "doc_id", strCol: String = "s"): DataFrame = {
    // six downstream branches (segments, probes, two short-string sides,
    // two verification sides) reuse this frame; persist it so Catalyst
    // doesn't re-derive the projection per branch (the jaccardPairs
    // idiom — persist, not localCheckpoint: checkpointed blocks are
    // executor-pinned and unrecoverable on executor loss, a non-starter
    // for a corpus-scale input). Only the bounded PAIR result is
    // checkpoint-materialized, so the input can unpersist on return.
    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).cast("string").as("s"), length(col(strCol)).as("l"))
      .persist()
    // indexed side: k+1 segments per string
    val segs = base.select(col("id"), col("s"), col("l"),
        explode(transform(sequence(lit(0), lit(k)), i =>
          struct(i.as("i"),
            substring(col("s"),
              segStart(i, col("l"), k) + 1,
              (segStart(i + 1, col("l"), k) - segStart(i, col("l"), k))
                .cast("int")).as("seg")))).as("e"))
      .select(col("id").as("a_id"), col("l").as("a_l"),
        col("e.i").as("i"), col("e.seg").as("seg"))
      .filter(length(col("seg")) > 0)
    // probe side: for each candidate indexed length la in [l-k, l+k] and
    // each segment index, every substring of the probe at the segment's
    // position shifted by [-k, +k]
    val probes = base.select(col("id"), col("s"), col("l"),
        explode(flatten(transform(
          sequence(greatest(col("l") - k, lit(1)), col("l") + k), la =>
            flatten(transform(sequence(lit(0), lit(k)), i => {
              val st = segStart(i, la, k)
              val ln = (segStart(i + 1, la, k) - st).cast("int")
              transform(sequence(st - k + 1, st + k + 1), p =>
                struct(la.as("a_l"), i.as("i"),
                  when(p >= 1 && ln > 0, substring(col("s"), p, ln))
                    .otherwise(lit(null)).as("sub")))
            }))))).as("e"))
      .select(col("id").as("b_id"),
        col("e.a_l").as("a_l"), col("e.i").as("i"), col("e.sub").as("seg"))
      .filter(col("seg").isNotNull && length(col("seg")) > 0)
    // strings of length <= k have empty segments the pigeonhole argument
    // cannot cover (an empty segment "matches" trivially); pair them
    // directly against the only possible partners (length <= 2k — the
    // ed-length bound). Bounded by the count of near-empty strings, which
    // is negligible at any corpus size.
    val shortCand = base.filter(col("l") <= k).alias("x")
      .join(base.filter(col("l") <= 2 * k).alias("y"),
        col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("d1"),
        greatest(col("x.id"), col("y.id")).as("d2"))
    val candidates = segs.join(probes, Seq("a_l", "i", "seg"))
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("d1"),
        greatest(col("a_id"), col("b_id")).as("d2"))
      .unionByName(shortCand)
      .distinct()
    val strs = base.select(col("id"), col("s"))
    try graft.perf.Lineage.cut(candidates
      .join(strs.toDF("d1", "s1"), "d1")
      .join(strs.toDF("d2", "s2"), "d2")
      .withColumn("ed", levenshtein(col("s1"), col("s2")))
      .filter(col("ed") <= k)
      .select(col("d1"), col("d2"), col("ed").cast("long").as("ed")))
    finally base.unpersist()
  }
}
