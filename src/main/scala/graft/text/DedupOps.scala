package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora: exact (fingerprint
  * group-by), n-gram Jaccard, MinHash+LSH, SimHash. Public algorithms
  * (Broder '97 minhash/shingling, Charikar '02 simhash) re-expressed as
  * Spark dataflows.
  *
  * Scale design: every method is shuffle-bounded by (doc_id, shingle) or
  * candidate-pair cardinality — never all-pairs. MinHash banding and
  * SimHash chunk-blocking keep candidate generation sub-quadratic, which
  * is the difference between "works on 60k docs" and "works on 10B docs".
  */
object DedupOps {

  /** Exact dedup: keep the lowest-id document per fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    docs.withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** (doc_id, shingle) exploded distinct-shingle pairs. The words array is
    * materialized first so the tokenizing split runs once per document
    * (see TextOps.shinglesFromWords). */
  def shingleTable(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        explode(TextOps.shinglesFromWords(col("__w"), n)).as("shingle"))

  /** All-pairs n-gram Jaccard ≥ threshold, exact.
    *
    * Candidate generation uses *prefix filtering* (PPJoin family, exact):
    * order each doc's shingles rarest-first (global frequency, shingle as
    * tie-break) and index only the first `|x| - ceil(t·|x|) + 1` — any
    * pair with Jaccard ≥ t must share an indexed shingle, and hot
    * shingles (the quadratic blowup in a naive inverted-index join) drop
    * out of the index almost entirely. Candidates are then verified with
    * full-set intersection counts, so the output is exactly the naive
    * join's. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = shingleTable(docs, n, idCol, textCol).persist()
    try {
      val freq = grams.groupBy("shingle").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
      val szW = Window.partitionBy("doc_id")
      val prefix = grams.join(freq, "shingle")
        .withColumn("rn", row_number().over(w))
        .withColumn("sz", count(lit(1)).over(szW))
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .select("doc_id", "shingle")
      val candidates = prefix.alias("a")
        .join(prefix.alias("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      // materialize before unpersisting grams (a lazy return would
      // recompute the shingle table three times in verifyPairs)
      verifyPairs(candidates, grams, threshold).localCheckpoint(eager = true)
    } finally grams.unpersist()
  }

  /** MinHash signatures: numHashes independent permutations approximated by
    * seeded xxhash64; signature j = min hash over the doc's shingles. */
  def minhashSignatures(grams: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("shingle"))).as(s"h$j"))
    grams.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding + exact-Jaccard verification.
    *
    * Bands of `rowsPerBand` signature values are hashed to buckets; docs
    * sharing any bucket are candidates (P[detect] = 1-(1-J^r)^b), then
    * candidates are verified with exact Jaccard so the output contains no
    * false positives. Verification joins only candidate pairs — the
    * all-pairs product never materializes.
    */
  def minhashLshPairs(docs: DataFrame, n: Int, threshold: Double,
      numHashes: Int = 24, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bands = numHashes / rowsPerBand
    val grams = shingleTable(docs, n, idCol, textCol).persist()
    try {
      val sigs = minhashSignatures(grams, numHashes)
      // band buckets: (band, hash(sig values in band))
      val buckets = sigs.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"h$j")): _*)
              .as("bucket"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      val candidates = buckets.alias("x")
        .join(buckets.alias("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      verifyPairs(candidates, grams, threshold).localCheckpoint(eager = true)
    } finally grams.unpersist()
  }

  /** Exact-Jaccard verification of candidate pairs against the shingle
    * table (no false positives escape the sketch stage).
    *
    * Intersections come from `array_intersect` over per-doc shingle-set
    * arrays joined to each side of the pair — two hash joins keyed on
    * doc id (broadcast when the set table is small) instead of an
    * exploded (pair × shingle) join, which blows up to |candidates|·|doc|
    * rows when a weak sketch over-generates candidates. */
  def verifyPairs(candidates: DataFrame, grams: DataFrame, threshold: Double): DataFrame = {
    val sets = grams.groupBy("doc_id")
      .agg(collect_list("shingle").as("sh"), count(lit(1)).as("sz"))
    candidates
      .join(sets.toDF("d1", "sh1", "sz1"), "d1")
      .join(sets.toDF("d2", "sh2", "sz2"), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard") + lit(1e-9), 4).as("jaccard"))
  }

  /** 64-bit SimHash over word unigrams: per-bit vote of each word's
    * xxhash64, assembled into a long. */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.words(col(textCol))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = (0 until 64).map { k =>
      sum(when(col("h").bitwiseAND(lit(1L << k)) =!= 0, 1).otherwise(-1)).as(s"v$k")
    }
    tokens.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k => when(col(s"v$k") > 0, lit(1L << k)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: chunk-blocked candidate generation (pairs with
    * hamming ≤ maxHamming must share at least one of maxHamming+1 chunks —
    * pigeonhole), then hamming filter, then exact-Jaccard verification. */
  def simhashPairs(docs: DataFrame, maxHamming: Int, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val sigs = simhash(docs, idCol, textCol).persist() // read by both join sides
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("val"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.val"))
    val candidates = chunks.alias("x")
      .join(chunks.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.val") === col("y.val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: random pairs
      .distinct()                           // sit at hamming ≈ 32 and vanish
      .select("d1", "d2")
    val grams = shingleTable(docs, n, idCol, textCol).persist()
    try verifyPairs(candidates, grams, threshold).localCheckpoint(eager = true)
    finally grams.unpersist()
  }
}
