package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality scoring without the external LM:
  * train a bigram model ON the corpus itself (add-α smoothing), then
  * score every document by its mean per-bigram surprisal
  * −log₂ P(w₂ | w₁). Documents full of improbable word transitions
  * (gibberish, mangled extraction, wrong-language fragments) score high;
  * fluent text scores low — the perplexity-bucket signal CCNet uses to
  * tier a crawl into head/middle/tail quality bands, self-contained
  * enough to run where no pretrained LM artifact is available.
  *
  * Scale shape: every stage is a keyed shuffle with map-side combine on
  * bounded-vocabulary keys — bigram counts by (w₁, w₂), context counts
  * by w₁, then one join of the corpus bigram stream against both count
  * tables and a final per-document aggregate. Nothing is all-pairs;
  * nothing collects beyond the single vocabulary-size scalar. At 100 TB
  * the count tables are vocabulary-bounded (≪ corpus) and the bigram
  * stream rides the same scan that tokenized the text.
  *
  * P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁·) + α·V), where c(w₁·) counts w₁'s
  * occurrences as a bigram left context and V is the distinct-token
  * vocabulary size. Documents with fewer than 2 tokens have no bigrams
  * and are absent from the output (the caller's length filter runs
  * before quality scoring in every real pipeline).
  *
  * Output: idCol, surprisal (mean −log₂ P, 4dp), n_bigrams.
  */
object LmScore {

  def bigramSurprisal(docs: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val w = docs.select(col(idCol), TextOps.words(col(textCol)).as("__w"))
    val pairs = w.filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__w) - 2), i -> struct(__w[i] AS w1, __w[i + 1] AS w2))"))
        .as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val bigramCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
    val contextCounts = pairs.groupBy("w1").agg(count(lit(1)).as("__cu"))
    val vocab = w.select(explode(col("__w")).as("__t"))
      .agg(countDistinct("__t")).head().getLong(0)
    pairs
      .join(bigramCounts, Seq("w1", "w2"))
      .join(contextCounts, Seq("w1"))
      .withColumn("__lp",
        -log2((col("__cb") + lit(alpha)) / (col("__cu") + lit(alpha * vocab))))
      .groupBy(idCol)
      .agg(round(avg("__lp") + lit(1e-9), 4).as("surprisal"),
        count(lit(1)).as("n_bigrams"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"), hashed-n-gram features
    * reduced to the unigram case: weight(d) = mean_w [ln p_target(w) −
    * ln p_raw(w)] over d's tokens, with add-α smoothing over the shared
    * raw-corpus vocabulary. Documents whose token distribution looks like
    * the target domain score high; selecting the top fraction by weight
    * is the deterministic (temperature→0) variant of DSIR's resampling.
    *
    * Scale shape: ONE token scan computes both models — the raw count
    * and the target count (a conditional sum on the same key) come out
    * of a single vocabulary-bounded aggregate, so there is exactly one
    * corpus-token shuffle plus the per-document average. The per-token
    * log-ratio table is vocabulary-sized and joins back against the
    * token stream on the already-partitioned key. Driver traffic: three
    * scalars (vocab size, raw token count, target token count).
    *
    * `targetPred` marks target-domain rows (e.g. `col("lang") === "en"`);
    * the target corpus is a subset of `docs`, as in DSIR's
    * raw-vs-target formulation. Output: idCol, weight (4-dp), n_tokens.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      alpha: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val toks = docs.select(col(idCol), targetPred.cast("boolean").as("__tgt"),
      explode(TextOps.words(col(textCol))).as("w"))
    val scalars = toks.agg(
      countDistinct("w").cast("double").as("v"),
      count(lit(1)).cast("double").as("nRaw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).cast("double").as("nTgt")).head()
    val nRaw = scalars.getDouble(1)
    require(nRaw > 0, "corpus has no tokens")
    val (v, nTgt) = (scalars.getDouble(0), scalars.getDouble(2))
    require(nTgt > 0, "target predicate selects no tokens")
    val counts = toks.groupBy("w").agg(
      count(lit(1)).cast("double").as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).cast("double").as("__ct"))
    val llr = counts.withColumn("__llr",
      log((col("__ct") + alpha) / (nTgt + alpha * v)) -
        log((col("__cr") + alpha) / (nRaw + alpha * v)))
    toks.join(llr.select("w", "__llr"), Seq("w"))
      .groupBy(idCol)
      .agg(round(avg("__llr") + lit(1e-9), 4).as("weight"),
        count(lit(1)).as("n_tokens"))
  }
}
