// dev scratch — is the shingle HOF expression the wall of the text-dedup
// task CPU? A/B: full shingleTable vs its stages (words split only;
// words+transform concat; + explode + xxhash), noop-sunk, per-rep walls.
//   runMain graft.tools.ProfShingle <sfDir> [reps]
package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.text.TextOps

object ProfShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).localCheckpoint()

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[profshingle] $name rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }

    time("words-only")(d.select(col("doc_id"), TextOps.words(col("text")).as("w")))
    time("shingles-hof")(d.select(col("doc_id"),
      TextOps.shingles(col("text"), 5).as("s")))
    time("full-shingleTable")(graft.text.DedupOps.shingleTable(d, 5))
    spark.stop()
  }
}
