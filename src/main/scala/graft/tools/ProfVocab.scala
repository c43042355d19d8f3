package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md attribution measurement for q74 (dev tool): the shingle
  * statistics that drive the prefix-filter join's cost — total shingle
  * tokens, distinct shingle types, and postings-per-type — measured on
  * the EXACT corpus + shingle pipeline the gate uses (dupCorpus union,
  * 5-word shingles, `DedupOps.shingleTable`).
  *
  * The q74 scaling claim: candidate-pair work is Σ(postings per
  * filtered type)², so when the generator's vocabulary saturates (fixed
  * 61 words → a capped shingle space), postings-per-type grows linearly
  * with the corpus and the gate super-linearizes through no fault of
  * the operator. The counter-experiment runs the same gate on ScaleGen's
  * `heaps` documents (vocabulary ∝ √tokens — Heap's law): if
  * postings-per-type stays flat there and q74's ratio drops to
  * near-linear, the saturation attribution is proven by experiment, not
  * argued from type counts.
  *
  * Usage: runMain graft.tools.ProfVocab <dir> [dir2 ...]
  */
object ProfVocab {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfVocab <dir> [dir2 ...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profvocab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { dir =>
      // the gate's dupCorpus: documents ∪ mutated near-copies
      val d = graft.Tables.t(spark, dir, "documents").select("doc_id", "text")
      val corpus = d.unionAll(
        d.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra token extra2")).as("text")))
      val grams = graft.text.DedupOps.shingleTable(corpus, 5)
      // Σ n·(n−1)/2 over types = the inverted-index join's raw candidate
      // pairs — THE statistic the prefix filter fights; its growth rate,
      // not the type count, is what super-linearizes the gate
      val r = grams.groupBy("shingle").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("types"), sum("n").as("tokens"),
          max("n").as("maxPost"), avg("n").as("avgPost"),
          sum(col("n") * (col("n") - 1) / 2).as("rawPairs")).head()
      println(f"[profvocab] $dir%-32s tokens=${r.getLong(1)}%,d " +
        f"types=${r.getLong(0)}%,d  postings/type avg=${r.getDouble(3)}%.2f " +
        f"max=${r.getLong(2)}%,d  rawPairs=${r.getDouble(4)}%,.0f")
    }
    spark.stop()
  }
}
