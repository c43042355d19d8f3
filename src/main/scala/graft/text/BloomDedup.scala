package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

import graft.tables.GraftTable

/** Bloom-membership exact dedup: dedup an ingest batch against a corpus
  * whose membership is summarized as a Bloom filter over 64-bit text
  * fingerprints — the sketch counterpart of the exact persisted postings
  * index ([[DedupIndex]]), for the common production case where the
  * question is only "is this exact text already in the corpus?".
  *
  * Scale shape (the reason this exists next to q209/q216): the probe is
  * a broadcast of the filter (bits ∝ corpus size, ~1.2 GB per 10⁹ docs
  * at 1% fpp; shard by `fp % S` when that outgrows one task) followed by
  * a scan-local filter of the batch — the corpus is NOT shuffled, read,
  * or joined at probe time. Only the bloom's surviving candidates (true
  * dups + fpp false positives) reach the exact verification join, and
  * that candidate set is small enough to broadcast, so the verify pass
  * is a corpus scan with a broadcast-hash join: zero shuffles end to
  * end. False negatives are impossible (Bloom guarantee), so the output
  * equals the exact batch-vs-corpus text join.
  *
  * The filter itself is built distributed (partial filters OR-merged,
  * `DataFrameStatFunctions.bloomFilter`) and persisted as a one-row
  * binary-payload [[GraftTable]] — build once at corpus-compaction time,
  * reopen per ingest batch, same build-once/probe-many contract as
  * [[graft.vector.AnnIndex]] / [[DedupIndex]].
  *
  * Reference behavior: exact-dup screening of `HF`-style ingest loops
  * (see SURVEY §2.12); membership-sketch design per Broder & Mitzenmacher,
  * "Network Applications of Bloom Filters" (2004).
  */
object BloomDedup {

  private val FppProp = "graft.bloom.fpp"
  private val ItemsProp = "graft.bloom.items"

  /** 64-bit fingerprint of whitespace-normalized lower-cased text — the
    * same normalization as [[TextOps.fingerprint]], hashed to a long so
    * the filter stores 8-byte keys. */
  def fp(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Build the corpus membership filter (distributed partial filters,
    * OR-merged; the result is bounded by the bit-array size, not the
    * corpus row count). */
  def buildFilter(corpus: DataFrame, textCol: String = "text",
      fpp: Double = 0.01): BloomFilter = {
    val fps = corpus.select(fp(col(textCol)).as("fp"))
    val n = fps.count()
    // Spark's stat.bloomFilter NPEs on an empty frame (null aggregate
    // buffer); an empty corpus has an empty membership set
    if (n == 0) BloomFilter.create(1, fpp)
    else fps.stat.bloomFilter("fp", n, fpp)
  }

  /** Persist the filter as a one-row GraftTable (binary payload + item
    * count; fpp in TBLPROPERTIES) — the persisted-artifact pattern of
    * the other indexes, so ingest jobs reopen instead of rebuilding. */
  def build(corpus: DataFrame, path: String, textCol: String = "text",
      fpp: Double = 0.01): GraftTable = {
    val s = corpus.sparkSession
    val bf = buildFilter(corpus, textCol, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val n = corpus.count()
    val schema = StructType(Seq(
      StructField("filter", BinaryType), StructField("items", LongType)))
    val t = GraftTable.create(s, path, schema,
      Map(FppProp -> fpp.toString, ItemsProp -> n.toString))
    import s.implicits._
    t.append(Seq((bos.toByteArray, n)).toDF("filter", "items"),
      "BLOOM INDEX BUILD")
    t
  }

  /** Reopen a persisted filter. */
  def load(t: GraftTable): BloomFilter = {
    val bytes = t.read().select("filter").head().getAs[Array[Byte]](0)
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Exact (batch_id, corpus_id) duplicate pairs of an ingest batch vs
    * the corpus, bloom-prefiltered: rows the filter rejects never reach
    * the join (no false negatives), survivors are verified exactly on
    * the normalized text so fpp and 64-bit collisions cannot leak into
    * the output.
    *
    * The membership probe is a scala UDF over the broadcast filter — a
    * bitmap lookup Spark exposes no column function for; its input is
    * already the codegen'd xxhash64 column, so the non-codegen island is
    * one long→boolean call per batch row. */
  def dedupBatch(bf: BloomFilter, corpus: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = corpus.sparkSession
    val bcast = s.sparkContext.broadcast(bf)
    val might = udf((f: Long) => bcast.value.mightContainLong(f))
    val norm = (c: Column) => regexp_replace(lower(trim(c)), "\\s+", " ")
    val candidates = batch
      .select(col(idCol).as("b_id"), norm(col(textCol)).as("__bt"),
        fp(col(textCol)).as("__fp"))
      .filter(might(col("__fp")))
    val corpusKeyed = corpus
      .select(col(idCol).as("c_id"), norm(col(textCol)).as("__ct"),
        fp(col(textCol)).as("__cfp"))
    // candidates are fpp-bounded — broadcast them so the corpus side
    // stays a shuffle-free scan
    corpusKeyed.join(broadcast(candidates),
        col("__cfp") === col("__fp") && col("__ct") === col("__bt"))
      .select(col("b_id"), col("c_id"))
  }
}
