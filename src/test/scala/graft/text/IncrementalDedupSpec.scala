package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Incremental dedup must equal the full-corpus recompute restricted to
  * batch-touching pairs — the one-sided prefix bound (batch prefixes
  * probing an unfiltered corpus index) is exact, not approximate. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("incremental pairs equal full recompute restricted to the batch") {
    val d = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val batch = d.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" tail x")).as("text"))
    val incremental = DedupOps.incrementalJaccardPairs(
        DedupOps.shingleTable(d, 5), batch, n = 5, threshold = 0.5)
      .select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val full = DedupOps.jaccardPairs(d.unionAll(batch), n = 5, threshold = 0.5)
      .filter(col("d2") >= 500000) // pairs touching a batch doc
      .select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(incremental == full)
    assert(incremental.nonEmpty, "planted near-copies must be found")
  }

  test("re-ingested id supersedes the indexed version (no merged sets)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red orange yellow green blue indigo violet pink")).toDF("doc_id", "text")
    // doc 1 re-ingested with doc 2's text: the new version must match
    // doc 2 at jaccard 1.0; a merged old+new shingle set would dilute it
    val batch = Seq((1L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.incrementalJaccardPairs(
        DedupOps.shingleTable(docs, 3), batch, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 1.0)), s"got $pairs")
  }

  test("an empty batch finds nothing and touches no corpus groups") {
    val d = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val empty = d.filter(lit(false))
    val out = DedupOps.incrementalJaccardPairs(
      DedupOps.shingleTable(d, 5), empty, n = 5, threshold = 0.5)
    assert(out.count() == 0)
  }
}
