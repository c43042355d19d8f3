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

  /** (doc_id, shingle) exploded distinct-shingle pairs. */
  def shingleTable(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), n)).as("shingle"))

  /** All-pairs n-gram Jaccard ≥ threshold via shingle-inverted-index join:
    * docs sharing a shingle become candidate pairs; exact Jaccard from
    * intersection counts + per-doc set sizes. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = shingleTable(docs, n, idCol, textCol)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grams.alias("a")
      .join(grams.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard") + lit(1e-9), 4).as("jaccard"))
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
      verifyPairs(candidates, grams, threshold)
    } finally grams.unpersist()
  }

  /** Exact-Jaccard verification of candidate pairs against the shingle
    * table (no false positives escape the sketch stage). */
  def verifyPairs(candidates: DataFrame, grams: DataFrame, threshold: Double): DataFrame = {
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(grams.toDF("d1", "shingle"), "d1")
      .join(grams.toDF("d2", "shingle"), Seq("d2", "shingle"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    candidates.join(inter, Seq("d1", "d2"), "inner")
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
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
    val sigs = simhash(docs, idCol, textCol)
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
    val grams = shingleTable(docs, n, idCol, textCol)
    verifyPairs(candidates, grams, threshold)
  }
}
