package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-derived subword tokenization — the greedy longest-match
  * (WordPiece-apply style) tokenizer every training pipeline runs to
  * size corpora in model tokens rather than whitespace words. Two
  * stages, both scale-shaped:
  *
  *  1. '''Vocabulary build''': count every character n-gram (lengths
  *     2..[[MaxGramLen]]) over every word OCCURRENCE in the corpus and
  *     keep the top-K by (count desc, gram asc). One gram-keyed shuffle
  *     with map-side combine — distinct grams are vocabulary-bounded
  *     (Heap's law), never corpus-bounded — then a TakeOrderedAndProject
  *     top-K. Only K strings reach the driver.
  *  2. '''Greedy tokenize''': each word is walked left-to-right taking
  *     the LONGEST vocab gram at each position (single characters are
  *     the implicit fallback, so tokenization is total — unseen
  *     characters emit themselves). Pure map-side projection against the
  *     broadcast K-entry vocab set: zero shuffles, so the stage scales
  *     with input splits alone.
  *
  * Determinism: the (count desc, gram asc) tie-break makes the vocab —
  * and therefore every token boundary — exactly reproducible, which is
  * what lets the q262 oracle replay the whole chain (vocab build, the
  * greedy walk as a recursive boundary-reachability CTE, and the md5 of
  * the joined subtoken stream) in SQL.
  *
  * Reference scope: the reference counts tokens only as whitespace
  * splits (its notebooks' wordcount-style aggregates); a real subword
  * tokenizer is the training-data extension (SURVEY §2.12). The greedy
  * longest-match apply is the WordPiece algorithm of Wu et al. '16 §4.1
  * (vocabulary GIVEN); the frequency-ranked vocab stands in for the
  * BPE merge-learning loop, whose priority-order apply is inherently
  * sequential per word and deliberately out of scope.
  */
object Subword {

  /** Longest vocab gram considered (and generated) — bounds the greedy
    * probe count per character position. */
  val MaxGramLen = 4

  // coalesce: a NULL text must tokenize as zero words (the UDF would
  // otherwise receive a null array and throw out of the projection)
  private def words(text: Column): Column =
    filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"),
      w => length(w) > 0)

  /** Top-`topK` character n-grams (lengths 2..[[MaxGramLen]]) by corpus
    * occurrence count, ties broken gram-ascending. Returned sorted; at
    * most `topK` strings ever reach the driver. */
  def buildVocab(docs: DataFrame, textCol: String = "text",
      topK: Int = 40): Array[String] = {
    val w = docs.select(explode(words(col(textCol))).as("word"))
    // per word occurrence, all contiguous substrings of each length —
    // sequence() must be guarded: Spark generates DESCENDING ranges when
    // start > stop, so a too-short word needs an explicit empty array
    val gramArrs: Seq[Column] = (2 to MaxGramLen).map { l =>
      when(length(col("word")) >= l,
        transform(sequence(lit(0), length(col("word")) - l),
          i => col("word").substr(i + 1, lit(l))))
        .otherwise(array())
    }
    w.select(explode(concat(gramArrs: _*)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(topK)
      .select("gram")
      .collect()
      .map(_.getString(0)) // bounded: <= topK rows
  }

  /** Greedy longest-match tokenization of one word against `vocab`
    * (grams of length 2..[[MaxGramLen]]; different lengths can never be
    * equal strings, so one flat set suffices). Single chars fall back to
    * themselves. Returns the subtokens in order. */
  def tokenizeWord(word: String, vocab: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var p = 0
    while (p < word.length) {
      var l = math.min(MaxGramLen, word.length - p)
      while (l >= 2 && !vocab.contains(word.substring(p, p + l))) l -= 1
      if (l < 2) l = 1
      out += word.substring(p, p + l)
      p += l
    }
    out.result()
  }

  /** Per-document subword statistics under the corpus-derived top-`topK`
    * vocab: word count, subtoken count, fertility (subtokens per word,
    * 6-dp), and the md5 of the space-joined subtoken stream (which pins
    * every token boundary of every word — any drifted vocab entry or
    * walk off-by-one hash-mismatches). Output:
    * doc_id, n_words, n_subtok, fertility, subtok_hash. */
  def tokenizeStats(docs: DataFrame, textCol: String = "text",
      topK: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    val vocab = buildVocab(docs, textCol, topK).toSet
    val bc = spark.sparkContext.broadcast(vocab)
    // one UDF call per document: the greedy walk is inherently
    // sequential per word, so a UDF IS the operator (media-codec
    // precedent); everything around it stays relational
    val tok = udf { (ws: Seq[String]) =>
      val v = bc.value
      val sb = new StringBuilder
      var nTok = 0
      ws.foreach { word =>
        tokenizeWord(word, v).foreach { t =>
          if (sb.nonEmpty) sb.append(' ')
          sb.append(t)
          nTok += 1
        }
      }
      (ws.size, nTok, sb.toString)
    }
    docs
      .select(col("doc_id"), tok(words(col(textCol))).as("t"))
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
