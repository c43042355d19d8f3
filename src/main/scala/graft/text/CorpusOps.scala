package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management dataflows for training-data pipelines: sequence
  * packing, stratified sampling, vocabulary coverage. Companions to the
  * per-document ops in [[TextOps]] (pure projections) — these are the
  * whole-corpus operators, each written as the shape that survives 100 TB
  * (no global single-partition window, no driver-side data loops; driver
  * traffic is bounded by partition count or vocabulary size, never corpus
  * size).
  */
object CorpusOps {

  /** Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    * documents are concatenated in `idCol` order and the token stream is
    * split into fixed-`capacity` sequences; each document reports the
    * half-open token span it occupies and the range of sequence ids it
    * lands in.
    *
    * Needs a global prefix sum of token counts — computed distributed:
    * range-repartition on the order key, running sum *within* each range
    * partition (keyed window, never a single global partition), then the
    * per-partition totals (one row per partition, metadata-scale) become
    * partition start offsets via a broadcast join. Two passes over the
    * data, zero rows through the driver beyond the partition-total list.
    * The pid-tagged frame is checkpointed so both passes see identical
    * range boundaries (repartitionByRange samples its bounds).
    *
    * Input must carry `idCol` (globally unique order key) and `nCol`
    * (tokens per document, >= 1). Output: idCol, nCol, tok_start,
    * seq_first, seq_last, n_seqs.
    */
  def packSequences(docs: DataFrame, capacity: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tagged = docs
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val inPart = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = tagged.withColumn("__cum", sum(col(nCol).cast("long")).over(inPart))
    // one row per partition → driver → exclusive prefix offsets
    val totals = tagged.groupBy("__pid")
      .agg(sum(col(nCol).cast("long")).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.dropRight(1).zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val cap = lit(capacity.toLong)
    run.join(offDf, Seq("__pid"))
      .withColumn("__end", col("__cum") + col("__off"))
      .withColumn("tok_start", col("__end") - col(nCol))
      .select(col(idCol), col(nCol).cast("long").as(nCol), col("tok_start"),
        floor(col("tok_start") / cap).as("seq_first"),
        floor((col("__end") - 1) / cap).as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Deterministic stratified sampling: within each stratum, rank documents
    * by a multiplicative (Knuth) hash of their stable id and keep the first
    * `ceil(fraction * stratum_size)`. Hash-ranked — not RNG — so the sample
    * is reproducible across engines and reprocessing runs, and adding new
    * documents only perturbs the sample by the new ids' hash positions (no
    * global reshuffle of the selection). One keyed shuffle on the stratum
    * column; stratum sizes ride the same window, no extra aggregate pass.
    *
    * Output: all input columns + sample_rank (1-based within stratum) +
    * n_stratum.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String, fraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    val h = (col(idCol) * lit(2654435761L)) % lit(4294967296L)
    val w = Window.partitionBy(stratumCol).orderBy(col("__h"), col(idCol))
    val all = Window.partitionBy(stratumCol)
    docs.withColumn("__h", h)
      .withColumn("sample_rank", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(all))
      .filter(col("sample_rank") <= ceil(col("n_stratum") * lit(fraction)))
      .drop("__h")
  }

  /** Vocabulary coverage: global word frequencies with rank and cumulative
    * share of all tokens — the standard tokenizer-design / heavy-hitter
    * report ("how many types cover 90% of tokens").
    *
    * The corpus-size work is the map-side-combined word count; everything
    * after operates on the *vocabulary* (bounded by distinct types, ~1e6-1e8
    * at web scale — metadata next to a 100 TB corpus), so the single-
    * partition rank window never sees corpus-scale data. The grand total
    * rides a broadcast 1-row join.
    */
  def vocabCoverage(docs: DataFrame, textCol: String = "text",
      topK: Int = 50): DataFrame = {
    val counts = docs
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").cast("double").as("__tot"))
    val byFreq = Window.orderBy(col("n").desc, col("word"))
    counts
      .withColumn("rank", row_number().over(byFreq))
      .withColumn("__cum", sum("n").over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(tot))
      .select(col("word"), col("n"),
        col("rank"),
        round(col("__cum") / col("__tot") + lit(1e-9), 6).as("cum_share"))
  }
}
