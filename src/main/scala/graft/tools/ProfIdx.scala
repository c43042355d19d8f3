package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of the q216 dedup-index gate (build vs reopen vs
  * probe), in its own scratch subdirectories — safe to run alongside
  * nothing else, but it never wipes the shared scratch root. Dev tool;
  * not part of the driver contract. */
object ProfIdx {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profidx] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { rep =>
      val d = graft.Tables.t(spark, sfDir, "documents").select("doc_id", "text")
      val path = graft.queries.Scratch.dir(s"profidx$rep")
      val idx = time("build") { graft.text.DedupIndex.build(d, path, n = 5) }
      val reopened = time("reopen") { graft.tables.GraftTable.load(spark, path) }
      val batch = d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra token extra2")).as("text"))
        .unionAll(d.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" extra token extra3")).as("text")))
      time("probe") {
        graft.text.DedupIndex.dedupBatch(reopened, batch, threshold = 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      // sub-phase attribution of the probe pipeline
      val bg = time("shingle") {
        val g = graft.text.DedupOps.shingleTable(batch, 5).persist()
        g.count(); g
      }
      time("pipeline") {
        graft.text.DedupOps.incrementalPipeline(
          reopened.read().select("doc_id", "shingle"), bg, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      // candidate generation alone (pipeline minus verify): replicate the
      // prefix + join steps against the index
      time("cands") {
        import org.apache.spark.sql.expressions.Window
        val corpusGrams = reopened.read().select("doc_id", "shingle")
        val wDf = Window.partitionBy("shingle")
        val wRn = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
        val wSz = Window.partitionBy("doc_id")
        val bPrefix = bg
          .withColumn("df", count(lit(1)).over(wDf))
          .withColumn("rn", row_number().over(wRn))
          .withColumn("sz", count(lit(1)).over(wSz))
          .filter(col("rn") <= col("sz") - ceil(lit(0.5) * col("sz")) + 1)
          .select("doc_id", "shingle")
        val vsCorpus = bPrefix.alias("p")
          .join(corpusGrams.alias("c"), col("p.shingle") === col("c.shingle"))
          .select(least(col("p.doc_id"), col("c.doc_id")).as("d1"),
            greatest(col("p.doc_id"), col("c.doc_id")).as("d2"))
          .filter(col("d1") =!= col("d2"))
        val vsBatch = bPrefix.alias("a")
          .join(bPrefix.alias("b"),
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        vsCorpus.unionByName(vsBatch).distinct()
          .write.format("noop").mode("overwrite").save()
      }
      bg.unpersist()
      graft.tables.GraftTable.deleteTree(java.nio.file.Paths.get(path))
    }
    spark.stop()
  }
}
