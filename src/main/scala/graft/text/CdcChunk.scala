package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) over token streams — the dedup axis
  * fixed-window chunking cannot serve: a single inserted/removed token
  * SHIFTS every fixed window after it, so two 99%-identical documents
  * share no fixed chunk, while content-defined boundaries (cut after
  * any token whose hash lands in a residue class) re-synchronize at the
  * first boundary past the edit and every later chunk matches again —
  * the storage-dedup idea (LBFS, SOSP '01; rsync's rolling block match)
  * applied at token granularity, where it catches prefixed/suffixed/
  * locally-edited near-copies by their EXACT shared middle.
  *
  * Boundary rule: token t ends a chunk iff
  * `rolling_hash(t) mod every == residue` ([[graft.functions.RollingHash]]
  * — the engine-portable 56-bit polynomial, so the q275 oracle replays
  * the cut decision character-for-character with list_reduce). Expected
  * chunk length = `every` tokens, geometric. The trailing tokens after
  * the last boundary form the final chunk; a document with no boundary
  * is one chunk.
  *
  * Scale shape: chunking is a pure array projection inside the scan
  * (split → per-token hash → boundary indices → span slices), zero
  * shuffle until the caller groups by `chunk_hash` — and THAT group is
  * the one keyed corpus-scale shuffle of any cross-doc chunk-dedup
  * composition, same budget as every fingerprint dedup here.
  */
object CdcChunk {

  /** Per-chunk rows: idCol, chunk_id (0-based in doc order), n_tokens,
    * chunk_hash (md5 of the space-joined tokens), chunk (the text).
    * Tokens are the lowercased whitespace words ([[TextOps.words]]);
    * empty/NULL text yields no rows. */
  def chunks(docs: DataFrame, every: Int = 8, residue: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(every >= 2, "expected chunk length must be >= 2")
    require(residue >= 0 && residue < every, "residue must be in [0, every)")
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val ws = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), w => length(w) > 0)
    // boundary token indices (0-based): hash lands in the residue class
    val bnd = filter(sequence(lit(0), size(col("__ws")) - 1), i =>
      pmod(call_function("rolling_hash", element_at(col("__ws"), i + 1)),
        lit(every.toLong)) === residue)
    // span starts: 0 and each boundary+1; span ends: each boundary and
    // n-1. Strictly increasing boundaries make every span non-empty
    // except a possibly-empty trailing one (last token is a boundary),
    // which the start<=end filter drops — chunk ids stay dense.
    val spans = filter(
      zip_with(
        concat(array(lit(0)), transform(col("__bnd"), b => b + 1)),
        concat(col("__bnd"), array(size(col("__ws")) - 1)),
        (s, e) => struct(s.as("s"), e.as("e"))),
      p => p("s") <= p("e"))
    docs
      .withColumn("__ws", ws)
      .filter(size(col("__ws")) > 0)
      .withColumn("__bnd", bnd)
      .select(col(idCol), col("__ws"),
        posexplode(spans).as(Seq("chunk_id", "sp")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ",
          slice(col("__ws"), col("sp.s") + 1, col("sp.e") - col("sp.s") + 1))
          .as("chunk"))
      .select(col(idCol), col("chunk_id"),
        size(split(col("chunk"), " ")).as("n_tokens"),
        md5(col("chunk")).as("chunk_hash"), col("chunk"))
  }

  /** Chunk hashes shared by more than `maxDocsPerChunk` docs — the
    * boilerplate/template heavy hitters whose pair fan-out is quadratic
    * (a chunk in f docs contributes f·(f−1)/2 pairs: one boilerplate
    * header in 10⁶ docs → 10¹² pairs). Heavy hitters are by definition
    * few, so this table is small and its anti-join broadcasts. */
  def hotChunks(chunks: DataFrame, maxDocsPerChunk: Int,
      idCol: String = "doc_id"): DataFrame =
    chunks.select(col(idCol).as("d"), col("chunk_hash")).distinct()
      .groupBy("chunk_hash").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocsPerChunk)

  /** Cross-doc shared-chunk report between a base corpus and candidate
    * near-copies: for each (base, other) doc pair sharing ≥ `minShared`
    * distinct chunk hashes, the shared count and both chunk totals —
    * the CDC near-dup detector. One keyed shuffle on chunk_hash (the
    * inverted chunk index), pair aggregation bounded by docs sharing a
    * chunk.
    *
    * `maxDocsPerChunk` is the q197-style df-ceiling enforced IN-OPERATOR
    * (review finding — delegating it upstream left the quadratic hazard
    * live by default): chunks shared by more docs than the ceiling are
    * excluded from the PAIR JOIN (their fan-out is quadratic in doc
    * frequency — one boilerplate header in 10⁶ docs is 10¹² pairs); the
    * exclusion is silent here to stay lazy — callers wanting the
    * dropped set run [[hotChunks]] with the same ceiling, which is the
    * exact table the anti-join used. `n_chunks_1/2` keep counting every
    * chunk of the doc (the doc's true size), so `n_shared` becomes a
    * LOWER bound for docs whose overlap is exclusively mega-template
    * chunks — exactly the pairs a near-dup detector should not surface
    * anyway. Cost: one extra map-side-combined frequency aggregate; the
    * exclusion itself is an anti-join against the heavy hitters, which
    * AQE turns into a broadcast join at runtime when that table is
    * small (almost always) without risking the driver when it isn't. */
  def sharedChunks(chunks: DataFrame, minShared: Int = 2,
      idCol: String = "doc_id", maxDocsPerChunk: Int = 10000): DataFrame = {
    require(maxDocsPerChunk >= 1, "maxDocsPerChunk must be >= 1")
    val all = chunks.select(col(idCol).as("d"), col("chunk_hash")).distinct()
    // The hot-chunk exclusion stays LAZY: an eager count() here was a
    // full aggregate action at DataFrame-construction time even when the
    // result was never executed, and the unconditional broadcast() hint
    // could exhaust the driver when the "heavy hitters are few"
    // assumption fails (small ceiling × boilerplate-heavy corpus —
    // review finding). The anti-join now always composes into the plan
    // and AQE picks broadcast at runtime iff the hot table is actually
    // small; when no chunk crosses the ceiling the anti-join is a no-op
    // against an empty build side.
    val hot = hotChunks(chunks, maxDocsPerChunk, idCol)
    val c = all.join(hot.select("chunk_hash"), Seq("chunk_hash"), "left_anti")
    // totals count the doc's FULL chunk inventory (pre-ceiling): the
    // ratio n_shared / n_chunks keeps its meaning as "fraction of the
    // doc that is shared", with hot-template overlap excluded from the
    // numerator only
    val totals = all.groupBy("d").agg(count(lit(1)).as("n_chunks"))
    c.as("a").join(c.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("d1"), col("b.d").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(totals.withColumnRenamed("d", "d1")
        .withColumnRenamed("n_chunks", "n_chunks_1"), Seq("d1"))
      .join(totals.withColumnRenamed("d", "d2")
        .withColumnRenamed("n_chunks", "n_chunks_2"), Seq("d2"))
      .select("d1", "d2", "n_shared", "n_chunks_1", "n_chunks_2")
  }
}
