package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management dataflows for training-data pipelines: sequence
  * packing, stratified sampling, vocabulary coverage. Companions to the
  * per-document ops in [[TextOps]] (pure projections) — these are the
  * whole-corpus operators, each written as the shape that survives 100 TB
  * (no global single-partition window over corpus-scale data, no
  * driver-side data loops; driver traffic is bounded by partition count or
  * vocabulary size, never corpus size).
  */
object CorpusOps {

  /** Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    * documents are concatenated in `idCol` order and the token stream is
    * split into fixed-`capacity` sequences; each document reports the
    * half-open token span it occupies and the range of sequence ids it
    * lands in.
    *
    * Needs a global prefix sum of token counts — computed distributed:
    * rows are bucketed into contiguous id ranges by an explicit,
    * DATA-INDEPENDENT bucket expression (quantile bounds computed once,
    * one map-side-combined aggregate), the running sum is keyed *within*
    * each bucket (never a single global partition), and the per-bucket
    * totals (one row per bucket, metadata-scale) become bucket start
    * offsets via a broadcast join. Because the bucket assignment is a pure
    * expression over the id — not a sampled repartitionByRange — both
    * passes see identical boundaries with nothing pinned to executor
    * storage (no checkpoint, recoverable on executor loss).
    *
    * Input must carry `idCol` (globally unique NUMERIC order key) and
    * `nCol` (tokens per document, >= 1). The input plan must be
    * DETERMINISTIC across actions (a table/file read or other stable
    * lineage): the operator runs three passes over `docs` (quantile
    * bounds, bucket totals, the windowed output) without pinning the
    * data, which is what makes it survive 100 TB — ids minted with
    * uuid()/rand()/monotonically_increasing_id must be materialized to
    * storage first, the standard contract for any multi-action dataflow.
    * Output: idCol, nCol, tok_start, seq_first, seq_last, n_seqs.
    */
  def packSequences(docs: DataFrame, capacity: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBuckets = spark.sessionState.conf.numShufflePartitions
    // interior quantiles of the order key → bucket bounds (one aggregate;
    // at most nBuckets-1 values reach the driver)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds: Seq[Long] =
      if (probs.isEmpty) Nil
      else {
        val row = docs.select(percentile_approx(col(idCol).cast("long"),
          lit(probs.toArray), lit(10000)).as("b")).head()
        if (row.isNullAt(0)) Nil else row.getSeq[Long](0).distinct
      }
    // bucket = number of bounds strictly below the id (O(bounds) per row —
    // bounded by the shuffle-partition count, not data)
    val bucketOf: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit): _*), b => b < col(idCol).cast("long")))
    val tagged = docs.withColumn("__b", bucketOf)
    val inBucket = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = tagged.withColumn("__cum", sum(col(nCol).cast("long")).over(inBucket))
    // one row per bucket → driver → exclusive prefix offsets
    val totals = tagged.groupBy("__b")
      .agg(sum(col(nCol).cast("long")).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, tot)) =>
      (b, acc + tot)
    }.dropRight(1).zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    val offDf = broadcast(offsets.toSeq.toDF("__b", "__off"))
    val cap = lit(capacity.toLong)
    run.join(offDf, Seq("__b"))
      .withColumn("__end", col("__cum") + col("__off"))
      .withColumn("tok_start", col("__end") - col(nCol))
      .select(col(idCol), col(nCol).cast("long").as(nCol), col("tok_start"),
        floor(col("tok_start") / cap).as("seq_first"),
        floor((col("__end") - 1) / cap).as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Deterministic stratified sampling: within each stratum, rank documents
    * by `xxhash64` of their stable id and keep the first
    * `ceil(fraction * stratum_size)`. Hash-ranked — not RNG — so the sample
    * is reproducible across reprocessing runs, works for any id type
    * (string/UUID ids hash like numeric ones), and adding new documents
    * only perturbs the sample by the new ids' hash positions (no global
    * reshuffle of the selection). One keyed shuffle on the stratum column;
    * stratum sizes ride the same window, no extra aggregate pass.
    *
    * Output: all input columns + sample_rank (1-based within stratum) +
    * n_stratum.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String, fraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col("__h"), col(idCol))
    val all = Window.partitionBy(stratumCol)
    docs.withColumn("__h", xxhash64(col(idCol)))
      .withColumn("sample_rank", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(all))
      .filter(col("sample_rank") <= ceil(col("n_stratum") * lit(fraction)))
      .drop("__h")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis, IPL '06): each row races with key ln(u)/w — u a uniform
    * in (0,1), w its positive weight — and the k LARGEST keys are the
    * sample; equivalent to successive draws proportional to weight, in
    * one pass. The quality-weighted corpus draw every curation mixture
    * needs ("sample docs proportional to quality/length/domain
    * weight"), complementing [[stratifiedSample]] (per-stratum uniform)
    * and [[sampleToBudget]] (quota fill).
    *
    * u derives from md5 of the stable id — not RNG — so the sample is
    * reproducible across runs/engines AND replayable in ANSI SQL (the
    * q274 oracle recomputes the exact keys; xxhash64 wouldn't be):
    * u = (first-8-hex-digits(md5(id)) + 0.5) / 2^32, strictly inside
    * (0,1). Rows with NULL or non-positive weight are excluded (they
    * can never win a proportional draw).
    *
    * Scale shape: pure projection + global top-k by key — plans as
    * TakeOrderedAndProject (per-partition top-k, driver merge of k·P
    * rows), never a global sort. Output: input columns + sample_key.
    */
  def weightedSample(docs: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "sample size must be >= 1")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    docs.filter(col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .withColumn("sample_key", log(u) / col(weightCol).cast("double"))
      // ties impossible for continuous keys; id second for determinism
      .orderBy(desc("sample_key"), col(idCol))
      .limit(k)
  }

  /** Quality-threshold calibration against a token budget: the highest
    * score cutoff whose kept documents (score ≥ cutoff) carry at least
    * `budget` tokens — "keep the best N-billion tokens", the filter-
    * tuning step production curation runs before committing a threshold
    * (a mis-set constant silently deleting half the crawl is the
    * canonical accident; this derives the constant FROM the budget).
    *
    * Scale shape: scores arrive quantized (qualityScore rounds to 4 dp
    * → ≤ 10⁴ distinct values), so the corpus-scale work is ONE
    * map-side-combined (score → docs, tokens) aggregate; the descending
    * cumulative sum then runs over score-cardinality rows (metadata
    * next to the corpus — same bounded-collect class as vocabCoverage's
    * top-K). Returns one row: cutoff, kept_docs, kept_tokens,
    * total_tokens. If even the full corpus misses the budget, cutoff is
    * the minimum score (keep everything). */
  def qualityCutoff(docs: DataFrame, scoreCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    // token counts ride as long whatever the column's declared type (a
    // double token count would ClassCastException the getLong below —
    // review finding)
    val byScore = docs.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"))
    // score-cardinality rows: the partition-less window is over the
    // quantized-score aggregate, never corpus rows
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byScore
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
    val totRow = cum.agg(max(col("cum_tokens"))).head()
    // empty corpus (or all-NULL tokens): no cutoff exists — zero rows
    // with the output schema, never an NPE on the null aggregate
    if (totRow.isNullAt(0))
      return cum.filter(lit(false))
        .select(col("score").as("cutoff"), col("cum_docs").as("kept_docs"),
          col("cum_tokens").as("kept_tokens"), lit(0L).as("total_tokens"))
    val total = totRow.getLong(0)
    val hit = cum.filter(col("cum_tokens") >= math.min(budget, total))
      .orderBy(col("score").desc).limit(1)
    hit.select(col("score").as("cutoff"),
      col("cum_docs").as("kept_docs"),
      col("cum_tokens").as("kept_tokens"),
      lit(total).as("total_tokens"))
  }

  /** Vocabulary coverage: global word frequencies with rank and cumulative
    * share of all tokens — the standard tokenizer-design / heavy-hitter
    * report ("how many types cover 90% of tokens").
    *
    * The corpus-size work is the map-side-combined word count, computed
    * ONCE (the collapsed vocabulary is persisted across the two bounded
    * follow-up jobs, then released — the output is materialized
    * driver-side, so no returned plan pins the cache). Everything after
    * operates on the *vocabulary* (bounded by distinct types, ~1e6-1e8
    * at web scale — metadata next to a 100 TB corpus), and neither
    * follow-up is a global window: the grand total is one aggregate, and
    * the top-K by `(n desc, word)` is a distributed
    * TakeOrderedAndProject (per-partition top-K merged on the driver) —
    * no single-partition exchange at any vocabulary size. Rank and
    * cumulative share are then computed over the COLLECTED top-K rows —
    * driver work bounded by the caller's topK, fully deterministic (an
    * earlier round's range-bucketed window recomputed its sampled
    * repartitionByRange bounds per job, so the two passes could disagree
    * on bucket boundaries — review finding). */
  def vocabCoverage(docs: DataFrame, textCol: String = "text",
      topK: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totalRow = counts.agg(sum("n")).head()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cum_share",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      if (totalRow.isNullAt(0))
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val grand = totalRow.getLong(0).toDouble
      val top = counts.orderBy(col("n").desc, col("word")).limit(topK)
        .collect() // TakeOrderedAndProject: <= topK rows reach the driver
      var cum = 0L
      val rows = top.zipWithIndex.map { case (r, i) =>
        cum += r.getLong(1)
        org.apache.spark.sql.Row(r.getString(0), r.getLong(1), i + 1,
          BigDecimal(cum / grand + 1e-9)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    } finally counts.unpersist(blocking = false)
  }

  /** Token-budget mixture materialization — the step that turns mixture
    * WEIGHTS (the q201 temperature-scaled report) into an actual training
    * corpus: within each domain, documents are taken in deterministic
    * scrambled-id order until the domain's token budget is reached. The
    * document that crosses the budget line is kept, so a non-empty domain
    * always meets its budget unless it exhausts its documents; domains
    * with no budget row are dropped.
    *
    * Selection order is the q199 multiplicative Knuth scramble
    * `(id * 2654435761) mod 2^32` — not an RNG, so the materialized mix
    * is reproducible across runs and engines, and appending new documents
    * only inserts at their hash positions instead of reshuffling the
    * whole selection.
    *
    * Scale shape: the per-domain running token sum does NOT window over
    * one partition per domain (a handful of domains would serialize a
    * 100 TB corpus through a handful of tasks). Hash-range buckets split
    * every domain across the full shuffle width; in-bucket windows run in
    * parallel, and the cross-bucket correction is a per-(domain, bucket)
    * total — bounded metadata, the [[packSequences]] two-phase prefix-sum
    * idiom — turned into exclusive offsets on the driver.
    *
    * `budgets`: (domainCol, budget: long) — domain-cardinality, broadcast.
    * Non-negative numeric ids assumed (the scramble contract).
    * Output: idCol, domainCol, n_tokens, cum_tokens (running total in
    * selection order, ≤ budget + the crossing doc's tokens).
    */
  def sampleToBudget(docs: DataFrame, budgets: DataFrame,
      domainCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBuckets = spark.sessionState.conf.numShufflePartitions
    val bucketWidth = 4294967296L / nBuckets + 1
    val base = docs.select(col(idCol), col(domainCol),
        TextOps.tokenCountWs(col(textCol)).cast("long").as("n_tokens"),
        ((col(idCol).cast("long") * lit(2654435761L)) % lit(4294967296L))
          .as("__h"))
      .withColumn("__b", expr(s"__h div $bucketWidth").cast("int"))
    val inBucket = Window.partitionBy(domainCol, "__b")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = base.withColumn("__cum", sum("n_tokens").over(inBucket))
    // per-(domain, bucket) totals → driver → per-domain exclusive offsets
    val totals = base.groupBy(domainCol, "__b")
      .agg(sum("n_tokens").as("__tot"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.scanLeft(0L)((acc, r) => acc + r._3).dropRight(1)
        .zip(sorted).map { case (off, (dm, b, _)) => (dm, b, off) }
    }
    val offDf = broadcast(offsets.toDF(domainCol, "__b", "__off"))
    run.join(offDf, Seq(domainCol, "__b"))
      .join(broadcast(budgets), Seq(domainCol))
      .withColumn("cum_tokens", col("__cum") + col("__off"))
      .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Overlapping token-window chunking — the RAG-ingestion / long-document
    * pretraining primitive: each document's whitespace token stream is cut
    * into windows of `window` tokens advancing by `stride` (consecutive
    * chunks overlap by `window - stride`). A document always yields at
    * least one chunk; the last chunk may be short (the tail is never
    * dropped). Chunk count per doc is
    * `ceil(max(0, n - window) / stride) + 1`.
    *
    * Pure narrow projection (split → explode over a per-row `sequence` of
    * window starts → `slice`): no shuffle, whole-stage-codegen'd, output
    * rows ≈ input tokens / stride — the shape that rides a 100 TB scan
    * untouched. Tokenization matches [[TextOps.tokenCountWs]] (Java regex
    * `\s+` split, which drops trailing-empty fields — inputs are assumed
    * whitespace-trimmed, the same contract the token-count ops carry).
    *
    * Output: idCol, chunk_idx (0-based), chunk_start (token offset),
    * n_chunk_tokens, chunk_hash (md5 of the space-rejoined window —
    * chunk text at 100 TB is written, not compared, so the gate carries
    * the hash).
    */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got stride=$stride window=$window")
    val nChunks = (floor(
      (greatest(col("__n") - lit(window), lit(0)) + lit(stride - 1))
        / lit(stride)) + lit(1)).cast("int")
    val chunk = slice(col("__w"), col("chunk_idx") * stride + 1, lit(window))
    docs
      .select(col(idCol), split(col(textCol), "\\s+").as("__w"))
      .withColumn("__n", size(col("__w")))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        size(chunk).as("n_chunk_tokens"),
        md5(array_join(chunk, " ")).as("chunk_hash"))
  }

  /** The q199/q224 multiplicative Knuth scramble, overflow- and
    * sign-safe: the id is reduced with POSITIVE mod 2^31 BEFORE the
    * multiply, so the int64 product cannot wrap (2^31 · 2654435761 <
    * 2^63) and a negative id (hash-minted int64 keys go negative) still
    * lands in [0, 2^32) — `%` keeps the dividend's sign, which would
    * otherwise leak negative shard ids out of [[shuffleShards]]. Pure
    * integer arithmetic → identical in every engine; for non-negative
    * ids pmod ≡ %, so the oracle's plain-`%` replay is unchanged. */
  def knuthScramble(id: Column): Column =
    pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L) % lit(4294967296L)

  /** Deterministic shuffle-to-shards export layout — the "global shuffle"
    * step that precedes writing a training corpus: every document gets a
    * shard (which output file group it lands in) and a dense 0-based
    * position within that shard, both pure functions of the document id.
    * Hash-placed — not RNG — so re-running the export reproduces the same
    * layout bit-for-bit, resuming after a partial failure is safe, and the
    * order is uncorrelated with ingest order (the de-clustering training
    * wants).
    *
    * Scale shape: one keyed shuffle on the shard id; within a shard, the
    * position is a rank over the scramble key (WindowExec's external sort
    * spills, so a shard only needs to fit on disk, not in memory — with
    * `nShards` sized to ~1-10 GB of documents per shard the sort is
    * partition-local and parallel across shards). Nothing collects.
    *
    * Output: idCol, shard (int), pos (0-based long), both orderable.
    */
  def shuffleShards(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val inShard = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    docs.select(col(idCol), knuthScramble(col(idCol)).as("__h"))
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(inShard).cast("long") - 1)
      .drop("__h")
  }

  /** Per-domain curation report — the dataset-card table every corpus
    * release carries: for each (domain, source) cell, document and token
    * counts, mean document length, the exact-duplicate rate (1 − distinct
    * sha256 fingerprints / docs — the [[TextOps.fingerprint]] key, so the
    * report agrees with what exact dedup would remove), and the cell's
    * share of all corpus tokens.
    *
    * One scan, one map-side-combined aggregate keyed by the domain pair;
    * COUNT(DISTINCT fp) expands to the standard two-phase partial-distinct
    * plan (distinct fingerprints shuffle, not documents). The token-share
    * denominator rides a whole-frame window over the GROUPED rows —
    * domain-cardinality, metadata next to the corpus.
    *
    * Output: domainCol, sourceCol, n_docs, n_tokens, avg_chars (2 dp),
    * dup_rate (4 dp), token_share (6 dp).
    */
  def domainReport(docs: DataFrame,
      domainCol: String = "lang", sourceCol: String = "source",
      textCol: String = "text", charsCol: String = "n_chars"): DataFrame = {
    val g = docs
      .select(col(domainCol), col(sourceCol),
        TextOps.tokenCountWs(col(textCol)).cast("long").as("__nt"),
        col(charsCol).cast("double").as("__nc"),
        TextOps.fingerprint(col(textCol)).as("__fp"))
      .groupBy(domainCol, sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        round(avg("__nc") + lit(1e-9), 2).as("avg_chars"),
        countDistinct(col("__fp")).as("__uniq"))
    g.withColumn("__tot", sum("n_tokens").over(Window.partitionBy()).cast("double"))
      .select(col(domainCol), col(sourceCol), col("n_docs"), col("n_tokens"),
        col("avg_chars"),
        round(lit(1.0) - col("__uniq") / col("n_docs") + lit(1e-9), 4).as("dup_rate"),
        round(col("n_tokens") / col("__tot") + lit(1e-9), 6).as("token_share"))
  }

  /** Release-to-release corpus diff — the dataset-versioning report a
    * curation pipeline publishes alongside each corpus refresh: per
    * domain, how many documents were added, removed, changed (same id,
    * different [[TextOps.fingerprint]] — whitespace-only edits therefore
    * count as unchanged, matching what exact dedup would say), and
    * unchanged. The corpus-level analogue of the row-level DataValidator
    * hash-diff.
    *
    * One full-outer join keyed on the id (fingerprints ride the two
    * scans as projections; a changed 100 TB corpus shuffles ids +
    * 64-byte fingerprints, not text), then a domain-keyed count
    * aggregate over the classified rows. The domain of a removed doc
    * comes from the old side, otherwise the new side.
    *
    * Output: domainCol, n_added, n_removed, n_changed, n_unchanged.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      domainCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // presence is tracked by an explicit marker, NOT fingerprint
    // nullness — sha2(NULL) is NULL, so a NULL-text document would
    // otherwise misclassify as added/removed while present on both
    // sides; fingerprints compare null-safe for the same reason
    def keyed(df: DataFrame, side: String) = df.select(
      col(idCol),
      col(domainCol).as(s"__dom_$side"),
      TextOps.fingerprint(col(textCol)).as(s"__fp_$side"),
      lit(true).as(s"__in_$side"))
    val j = keyed(oldDocs, "old").join(keyed(newDocs, "new"), Seq(idCol), "full_outer")
    val cls = when(col("__in_old").isNull, "added")
      .when(col("__in_new").isNull, "removed")
      .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
      .otherwise("changed")
    j.select(coalesce(col("__dom_new"), col("__dom_old")).as(domainCol),
        cls.as("__cls"))
      .groupBy(domainCol)
      .agg(
        sum(when(col("__cls") === "added", 1).otherwise(0)).as("n_added"),
        sum(when(col("__cls") === "removed", 1).otherwise(0)).as("n_removed"),
        sum(when(col("__cls") === "changed", 1).otherwise(0)).as("n_changed"),
        sum(when(col("__cls") === "unchanged", 1).otherwise(0)).as("n_unchanged"))
  }

  /** Per-stratum winsorization bounds + clipped moments for a numeric
    * quality signal — the outlier-clamping step quality filters apply
    * before thresholding (a handful of pathological documents otherwise
    * drag the mean the threshold is calibrated against). Exact linear-
    * interpolated percentiles (`percentile`, h = (n−1)p — the same
    * definition DuckDB's quantile_cont uses, so the gate replays exactly);
    * at 100 TB swap in `percentile_approx` — the dataflow is unchanged.
    *
    * One aggregate pass for the bounds (stratum-keyed, map-side-combined),
    * one broadcast-join back for the clamped stats — the two-pass shape any
    * "statistic of a statistic" needs; the broadcast is stratum-cardinality.
    *
    * Output: stratumCol, p_lo, p_hi, n_below, n_above, mean_raw,
    * mean_winsorized (all rounded — 2 dp).
    */
  def winsorize(docs: DataFrame, stratumCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile range [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val bounds = docs.groupBy(stratumCol)
      .agg(percentile(v, lit(pLo)).as("p_lo"),
        percentile(v, lit(pHi)).as("p_hi"))
    docs.join(broadcast(bounds), Seq(stratumCol))
      .groupBy(col(stratumCol), col("p_lo"), col("p_hi"))
      .agg(
        sum(when(v < col("p_lo"), 1).otherwise(0)).as("n_below"),
        sum(when(v > col("p_hi"), 1).otherwise(0)).as("n_above"),
        round(avg(v) + lit(1e-9), 2).as("mean_raw"),
        round(avg(greatest(col("p_lo"), least(col("p_hi"), v))) + lit(1e-9), 2)
          .as("mean_winsorized"))
      .select(col(stratumCol),
        round(col("p_lo") + lit(1e-9), 2).as("p_lo"),
        round(col("p_hi") + lit(1e-9), 2).as("p_hi"),
        col("n_below"), col("n_above"), col("mean_raw"), col("mean_winsorized"))
  }

  /** Per-domain corpus statistical-health report — the dashboard row a
    * curation run publishes per release: token/type counts, type-token
    * ratio, the Zipf slope (OLS fit of ln(freq) on ln(rank) over the
    * top-`zipfTopK` words — a healthy natural-language corpus sits near
    * −1; a slope collapsing toward 0 flags template spam, one diving
    * past −2 flags a degenerate vocabulary), and exact interpolated
    * p50/p95 document lengths in tokens.
    *
    * Scale shape: every branch derives from the same two-column
    * (domain, text) projection — three columnar scans of pruned width,
    * no branch reading more. The (domain, word) count shuffle is
    * map-side combined and vocabulary-bounded; the per-domain rank
    * window runs over that vocabulary-scale table, never documents (and
    * the rank ≤ topK filter plans as WindowGroupLimit, cutting each
    * partition to its local top-K before the exchange). Doc lengths
    * shuffle as a (domain, doc) count, and their percentiles use the
    * q37 rank-window straddle
    * interpolation (spillable external sort) rather than Spark's
    * buffering `percentile` aggregate, so a billion-doc domain degrades
    * to disk instead of OOM. Output: domainCol, n_tokens, n_types,
    * ttr (6-dp), zipf_slope (4-dp), p50_len, p95_len (4-dp). */
  def corpusHealth(docs: DataFrame, domainCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id",
      zipfTopK: Int = 100): DataFrame = {
    val tok = docs.select(col(domainCol), col(idCol),
        explode(TextOps.words(col(textCol))).as("__word"))
      .filter(length(col("__word")) > 0)
    val counts = tok.groupBy(col(domainCol), col("__word"))
      .agg(count(lit(1)).as("__n"))
    val ranked = counts.withColumn("__rank",
      row_number().over(Window.partitionBy(domainCol)
        .orderBy(col("__n").desc, col("__word"))))
    val zipf = ranked.filter(col("__rank") <= zipfTopK)
      .groupBy(domainCol)
      .agg(regr_slope(log(col("__n")), log(col("__rank"))).as("__slope"))
    val totals = counts.groupBy(domainCol)
      .agg(sum("__n").as("n_tokens"), count(lit(1)).as("n_types"))
    // exact interpolated per-domain doc-length percentiles via the q37
    // rank-window straddle (matches DuckDB quantile_cont)
    val dl = tok.groupBy(col(domainCol), col(idCol))
      .agg(count(lit(1)).cast("double").as("__dn"))
    val wN = Window.partitionBy(domainCol)
    val wR = wN.orderBy("__dn")
    val rankedLen = dl
      .withColumn("__cnt", count(lit(1)).over(wN))
      .withColumn("__r", row_number().over(wR))
    def quant(p: Double): Column = {
      val pos = lit(1.0) + lit(p) * (col("__cnt") - 1)
      val lo = floor(pos)
      val xlo = max(when(col("__r") === lo, col("__dn")))
      val xhi = coalesce(max(when(col("__r") === lo + 1, col("__dn"))),
        max(when(col("__r") === lo, col("__dn"))))
      xlo + max(pos - lo) * (xhi - xlo)
    }
    val lens = rankedLen.groupBy(domainCol)
      .agg(
        round(quant(0.5) + lit(1e-9), 4).as("p50_len"),
        round(quant(0.95) + lit(1e-9), 4).as("p95_len"))
    totals
      .join(zipf, Seq(domainCol))
      .join(lens, Seq(domainCol))
      .select(col(domainCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens") + lit(1e-9), 6)
          .as("ttr"),
        round(col("__slope") + lit(1e-9), 4).as("zipf_slope"),
        col("p50_len"), col("p95_len"))
  }
}
