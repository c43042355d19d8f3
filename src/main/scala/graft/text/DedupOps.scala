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

  /** (doc_id, shingle) exploded distinct-shingle pairs, with the shingle
    * *hashed to int64* (xxhash64) at birth: every downstream exchange,
    * group-by, and set intersection then moves 8-byte longs instead of
    * ~40-byte strings — ~4× less shuffle width across the whole dedup
    * family. Jaccard over hashed sets equals Jaccard over string sets up
    * to 64-bit collisions (P ≈ k²/2⁶⁴ per document — negligible at any
    * corpus size). The words array is materialized first so the
    * tokenizing split runs once per document (see
    * TextOps.shinglesFromWords). */
  def shingleTable(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        explode(TextOps.shinglesFromWords(col("__w"), n)).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("shingle"))

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
  /** Prefix-filter candidate pairs (d1 < d2, distinct) over a shingle
    * table: exact for Jaccard ≥ threshold (see jaccardPairs doc). */
  private def prefixCandidates(grams: DataFrame, threshold: Double): DataFrame = {
    val freq = grams.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    // per-doc set sizes as a join (one row per doc; AQE broadcasts when
    // small, and the big side is already hash-partitioned by doc_id from
    // the window) instead of a second full-partition window pass
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val prefix = grams.join(freq, "shingle")
      .withColumn("rn", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "shingle")
    prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = shingleTable(docs, n, idCol, textCol).persist()
    // materialize before unpersisting grams (a lazy return would
    // recompute the shingle table three times in verifyPairs)
    try verifyPairs(prefixCandidates(grams, threshold), grams, threshold)
      .localCheckpoint(eager = true)
    finally grams.unpersist()
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

  /** Connected components over a near-dup pair graph: every node gets the
    * minimum doc id of its component as `cluster_rep` (the canonical
    * "keep one doc per duplicate cluster" resolution step that follows
    * pair mining in a dedup pipeline).
    *
    * Iterative min-label propagation: each round every node takes the min
    * of its own label and its neighbors' labels — one keyed shuffle per
    * round, converging in O(component diameter) rounds (near-dup
    * components are shallow: dup clusters are stars/short chains, so 2-3
    * rounds in practice; pathological long chains would call for
    * large-star/small-star, noted here for the 100-TB operator). Labels
    * are eagerly checkpointed each round so lineage stays flat.
    *
    * @param edges (d1, d2) undirected pair edges
    * @param nodes (doc_id) full node universe (singletons keep themselves)
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val sym = edges.select(col("d1").as("u"), col("d2").as("v"))
      .unionAll(edges.select(col("d2").as("u"), col("d1").as("v")))
      .persist()
    sym.count()
    var labels = nodes.select(col("doc_id").as("u"), col("doc_id").as("label"))
      .localCheckpoint(eager = true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(labels.select(col("u").as("v"), col("label").as("__nl")), "v")
        .groupBy("u").agg(min("__nl").as("__nb"))
      val next = labels
        .join(nbrMin, Seq("u"), "left")
        .select(col("u"),
          least(col("label"), coalesce(col("__nb"), col("label"))).as("label"))
        .localCheckpoint(eager = true)
      changed = next.alias("n")
        .join(labels.alias("o"), col("n.u") === col("o.u"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
    }
    sym.unpersist()
    labels.select(col("u").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** 64-bit SimHash over word unigrams: per-bit vote of each word's
    * xxhash64, assembled into a long. Bit k is set iff more than half the
    * tokens have bit k set (a ±1 vote sum > 0).
    *
    * The 64 per-bit counts are aggregated SWAR-style: 16 packed sums,
    * each holding four 16-bit lane counters (bits k, k+16, k+32, k+48),
    * so the hash aggregate evaluates 17 codegen'd columns instead of 64
    * sum(CASE WHEN) columns — ~4× less aggregation work per token row.
    * Lanes carry at 65 536 tokens per document; cap or pre-truncate docs
    * above that (typical LLM-corpus docs are orders of magnitude below). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    simhashFromWords(docs.select(col(idCol).as("doc_id"),
      TextOps.words(col(textCol)).as("__w")))

  /** As `simhash`, over a pre-tokenized (doc_id, __w: array) frame —
    * lets callers tokenize once and share the pass with shingling. */
  def simhashFromWords(wordsDf: DataFrame): DataFrame = {
    val tokens = wordsDf.select(col("doc_id"), explode(col("__w")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val laneMask = 0x0001000100010001L
    val aggs = (0 until 16).map { i =>
      sum(shiftrightunsigned(col("h"), i).bitwiseAND(lit(laneMask))).as(s"p$i")
    } :+ count(lit(1)).as("n")
    tokens.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { k =>
          val cnt = shiftrightunsigned(col(s"p${k % 16}"), (k / 16) * 16)
            .bitwiseAND(lit(0xFFFFL))
          // vote sum = 2*cnt - n; set the bit when it is positive
          when(cnt * 2 > col("n"), lit(1L << k)).otherwise(0L)
        }.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Chunk-blocked candidate pairs with hamming ≤ maxHamming: pairs within
    * the radius must share at least one of maxHamming+1 chunks
    * (pigeonhole), so only same-chunk-value buckets are joined. */
  private def chunkBlockCandidates(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("val"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.val"))
    chunks.alias("x")
      .join(chunks.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.val") === col("y.val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: random pairs
      .distinct()                           // sit at hamming ≈ 32 and vanish
      .select("d1", "d2")
  }

  /** SimHash near-dup pairs: {hamming ≤ maxHamming} ∩ {jaccard ≥ threshold},
    * exactly.
    *
    * Candidate generation adapts to the radius. At small radii the classic
    * chunk blocking (Manku et al. '07: 4 × 16-bit chunks for radius 3)
    * applies — buckets are sparse and the join is sub-quadratic. At high
    * radii pigeonhole blocking is *provably* dense, independent of data
    * skew: radius 12 forces 13 chunks of 4 bits, so every bucket holds
    * ~n/16 docs and the self-join is Θ(n²). There, candidates come from
    * the exact Jaccard prefix filter instead (sub-quadratic; recall 1.0
    * for the jaccard side of the intersection) and the simhash signature
    * is applied as a cheap per-pair hamming filter — same output, no
    * quadratic stage at any scale. */
  def simhashPairs(docs: DataFrame, maxHamming: Int, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val chunkBits = 64 / (maxHamming + 1)
    // tokenize once; signatures and shingles both derive from the array
    val wordsDf = docs.select(col(idCol).as("doc_id"),
      TextOps.words(col(textCol)).as("__w")).persist()
    val sigs = simhashFromWords(wordsDf).persist() // read by both join sides
    val grams = wordsDf.select(col("doc_id"),
      explode(TextOps.shinglesFromWords(col("__w"), n)).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("shingle")).persist()
    try {
      val raw =
        if (chunkBits >= 8) chunkBlockCandidates(sigs, maxHamming)
        else prefixCandidates(grams, threshold)
      val candidates = raw
        .join(sigs.select(col("doc_id").as("d1"), col("simhash").as("__s1")), "d1")
        .join(sigs.select(col("doc_id").as("d2"), col("simhash").as("__s2")), "d2")
        .filter(bit_count(col("__s1").bitwiseXOR(col("__s2"))) <= maxHamming)
        .select("d1", "d2")
      verifyPairs(candidates, grams, threshold).localCheckpoint(eager = true)
    } finally { grams.unpersist(); sigs.unpersist(); wordsDf.unpersist() }
  }
}
