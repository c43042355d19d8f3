package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase-match scan — the targeted
  * contamination detector n-gram decontamination (q200) cannot express:
  * "which training documents contain THIS exact benchmark phrase, where,
  * and how often". Token-level Jaccard and shingle dedup find whole-doc
  * similarity; a leaked eval question inside an otherwise-novel document
  * only falls out of a positional phrase probe.
  *
  * Index: one row per token occurrence (doc, position, token) — the
  * classic positional posting list (Zobel & Moffat, ACM CS '06), laid
  * out relationally so Catalyst can prune and push. Phrase probe for
  * "w1 w2 w3": postings(w1) ⋈ postings(w2) on (doc, pos+1) ⋈
  * postings(w3) on (doc, pos+2) — adjacency as equi-join keys, which
  * Catalyst extracts from the `pos + k` expressions, so every hop is a
  * hash join.
  *
  * Scale shape: the probe NEVER touches postings outside the phrase
  * vocabulary — the index is semi-joined against the (tiny, broadcast)
  * phrase-token set before any positional join, so shuffle volume is
  * bounded by occurrences-of-phrase-tokens, not corpus tokens. The
  * phrases side is metadata-scale and broadcast. Each of the three join
  * legs re-derives its pruned postings from the scan (three columnar
  * two-column reads — the textbook positional-probe cost); at 100 TB the
  * index itself would persist bucketed by token (the q216 shingle-index
  * pattern), turning each leg into a file-pruned read of just the
  * phrase-token buckets. The probe plan is identical either way.
  */
object PhraseIndex {

  /** Positional postings: doc_id, pos (0-based word index), tok.
    * Narrow projection + explode — no shuffle. */
  def postings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(filter(split(lower(trim(col(textCol))), "\\s+"),
          w => length(w) > 0)))
      .withColumnRenamed("pos", "pos")
      .withColumnRenamed("col", "tok")

  /** Exact 3-word phrase scan. `phrases` must carry
    * (phrase_doc, w1, w2, w3, phrase); output per phrase:
    * phrase_doc, phrase, n_docs (distinct matching docs), n_hits
    * (total occurrences), first_doc (min matching doc id). Phrases with
    * zero hits drop out (inner semantics — a phrase drawn FROM the
    * corpus always hits its own source). */
  def phraseScan(docs: DataFrame, phrases: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val p = postings(docs, textCol, idCol)
    // prune the index to the phrase vocabulary BEFORE any positional
    // join: the only corpus-scale shuffle is over these survivors
    val phraseToks = phrases
      .select(explode(array(col("w1"), col("w2"), col("w3"))).as("tok"))
      .distinct()
    val pruned = p.join(broadcast(phraseToks), Seq("tok"), "left_semi")
    val p1 = pruned.select(col("doc_id"), col("pos"), col("tok").as("t1"))
    val p2 = pruned.select(col("doc_id").as("d2"), col("pos").as("q2"),
      col("tok").as("t2"))
    val p3 = pruned.select(col("doc_id").as("d3"), col("pos").as("q3"),
      col("tok").as("t3"))
    broadcast(phrases)
      .join(p1, col("t1") === col("w1"))
      .join(p2, col("d2") === col("doc_id") && col("q2") === col("pos") + 1 &&
        col("t2") === col("w2"))
      .join(p3, col("d3") === col("doc_id") && col("q3") === col("pos") + 2 &&
        col("t3") === col("w3"))
      .groupBy("phrase_doc", "phrase")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"),
        min(col("doc_id")).as("first_doc"))
  }

  /** Phrase table drawn deterministically from the corpus itself: words
    * 4..6 (1-based) of every doc whose id ≡ `residue` (mod `every`) with
    * id < every·maxPhrases — the eval-set stand-in the q263 gate probes
    * with. An eval set is FIXED-SIZE by nature, so the bound is part of
    * the semantics: without it the phrase count grows with the corpus
    * and the probe's work becomes phrases × corpus — quadratic in
    * corpus size (measured: the unbounded form ran 4.5× per 10× at
    * m1→m10 and fell over at m100). */
  def phrasesFromDocs(docs: DataFrame, every: Int = 100, residue: Int = 3,
      maxPhrases: Int = 10,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = filter(split(lower(trim(col(textCol))), "\\s+"),
      w => length(w) > 0)
    docs.filter(col(idCol) % every === residue &&
        col(idCol) < every.toLong * maxPhrases)
      .select(col(idCol).as("phrase_doc"), ws.as("__ws"))
      // a selected doc with < 6 words can't yield a 3-word phrase at
      // offset 4 — skip it (under ANSI mode element_at would THROW on
      // the out-of-range index, not return null)
      .filter(size(col("__ws")) >= 6)
      .select(col("phrase_doc"),
        element_at(col("__ws"), 4).as("w1"),
        element_at(col("__ws"), 5).as("w2"),
        element_at(col("__ws"), 6).as("w3"))
      .withColumn("phrase",
        concat_ws(" ", col("w1"), col("w2"), col("w3")))
  }
}
