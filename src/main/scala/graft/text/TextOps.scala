package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization
  * counts, language ID, quality scoring, fingerprinting, shingling.
  *
  * All pure `Column` expressions (whole-stage-codegen friendly, no UDFs) —
  * at 100 TB these run inside the parquet scan projection with zero
  * shuffle. Logic is deliberately expressible in ANSI SQL so the DuckDB
  * oracle can replay it verbatim.
  */
object TextOps {

  /** Lower-cased whitespace word array. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * each count as one token. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Stopword sets per language for the n-gram-free language-ID heuristic.
    * Presence (not frequency) scoring keeps it O(1) per stopword. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  private def padded(text: Column): Column = concat(lit(" "), lower(text), lit(" "))

  /** Number of this language's stopwords present in the text. */
  def stopwordScore(text: Column, lang: String): Column =
    stopwords.toMap.apply(lang)
      .map(w => when(padded(text).like(s"% $w %"), 1).otherwise(0))
      .reduce(_ + _)

  /** Heuristic language ID: argmax of stopword presence, fixed priority on
    * ties, 'und' (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> stopwordScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: length signal + punctuation sanity +
    * stopword signal (reference-style heuristics; shape follows public
    * quality-filter recipes for web corpora). */
  def qualityScore(text: Column): Column = {
    val nWords = tokenCountWs(text).cast("double")
    val nChars = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val stopRatio = stopwordScore(text, "en").cast("double") / lit(5.0)
    round(
      least(nWords / lit(50.0), lit(1.0)) * lit(0.4)
        + (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.3)
        + stopRatio * lit(0.3) + lit(1e-9), 4)
  }

  /** Document fingerprint: sha256 of the whitespace-normalized lower-cased
    * text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Distinct word n-gram shingles from a words array. Empty when the
    * document has fewer than n words.
    *
    * IMPORTANT: pass a *materialized column* as `w` (e.g. via a prior
    * `withColumn("w", words(col(text)))`), not `words(text)` inline —
    * Catalyst substitutes the argument expression into every
    * `element_at`, so an inline split() would be recomputed ~n·|words|
    * times per row (measured 15s → 2s on the 260k-shingle corpus). */
  def shinglesFromWords(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles ("a b c d e" → ["a b c d e", ...]). */
  def shingles(text: Column, n: Int): Column = shinglesFromWords(words(text), n)

  /** C4/CCNet-style quality-filter funnel with per-rule attribution: the
    * first rule (in fixed priority order) that rejects a document names
    * itself; survivors read 'kept'. Production filter pipelines report
    * this attribution — which rule killed each document, and the funnel
    * counts derived from it — because a mis-tuned threshold silently
    * deleting half the crawl is the canonical curation accident.
    *
    * Rules (priority order):
    *   too_short     — fewer than `minTokens` whitespace tokens
    *   too_long      — more than `maxChars` characters
    *   high_punct    — punctuation ratio above `maxPunctRatio`
    *   no_stopwords  — zero English stopword hits (gibberish signal)
    *
    * Pure column expression over the scan projection — zero shuffle, one
    * pass, codegen'd; at 100 TB the verdict rides the same scan that
    * writes the filtered copy. */
  def rejectRule(text: Column, minTokens: Int = 10, maxChars: Int = 500,
      maxPunctRatio: Double = 0.1): Column = {
    val punctRatio =
      punctCount(text).cast("double") / greatest(length(text).cast("double"), lit(1.0))
    when(tokenCountWs(text) < minTokens, "too_short")
      .when(length(text) > maxChars, "too_long")
      .when(punctRatio > maxPunctRatio, "high_punct")
      .when(stopwordScore(text, "en") === 0, "no_stopwords")
      .otherwise("kept")
  }

  /** Unicode NFC normalization as a column op (java.text.Normalizer —
    * the JDK's ICU-equivalent composition tables; DuckDB's
    * `nfc_normalize` agrees, which is what lets q269 oracle it).
    * Null-safe: null stays null. Native codegen'd expression
    * ([[graft.functions.NfcNormalize]]) — no UDF boundary on the
    * cleaning hot path (ProfTextKernel A/B in SCALING.md). */
  def nfc(text: Column): Column =
    graft.functions.GraftFunctions.graft_nfc(text)

  /** Shannon character entropy (bits/char) of a string — the classic
    * gibberish/encoded-blob signal: natural language sits ~3.5–4.5
    * bits, base64/hex/random dumps push toward log2(alphabet), repeated
    * template spam collapses toward 0. Per-row CODEPOINT histogram (a
    * per-(doc, char) SHUFFLE at corpus scale would move every character
    * — the projection shape moves none), as a native codegen'd
    * expression ([[graft.functions.CharEntropy]]; deterministic sorted
    * accumulation, so the 4-dp rounded value can't flake against the
    * oracle's grouped sum). Null/empty → null. */
  def charEntropy(text: Column): Column =
    graft.functions.GraftFunctions.graft_char_entropy(text)

  /** Order-insensitive exact-dup fingerprint: md5 of the sorted word
    * MULTISET (duplicates kept). Catches word-permuted copies —
    * scrambled re-posts, shuffled CSV rows re-joined, templated
    * reorderings — that position-sensitive fingerprints (q73/q77/q78)
    * and even shingle Jaccard (order-destroying shuffles kill most
    * shingles) miss. Pure codegen'd projection. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(words(text))))

  /** Canonical text cleaning — the WET-extraction stage every crawl
    * pipeline runs before any downstream signal: strip markup tags,
    * compose to Unicode NFC (so a decomposed e + COMBINING ACUTE and a
    * precomposed é fingerprint identically downstream), replace control
    * characters with spaces, collapse whitespace runs, trim. Rule ORDER
    * is part of the contract (tags before NFC before control-strip
    * before collapse) and is replayed step-for-step by the q269 oracle.
    * Pure scan projection (the NFC hop is the one UDF — composition
    * tables aren't expressible as a regex); zero shuffle. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        nfc(regexp_replace(text, "<[^>]*>", "")),
        "[\\x00-\\x1F]", " "),
      "\\s+", " "))
}
