// dev scratch — plan evidence for pipelines whose GATE frame collapses to
// an RDD scan behind an eager lineage cut (the dedup probe) or whose hot
// projection lives inside a maintenance call (the OPTIMIZE curve layout):
// the judge-facing plan pair must show the INTERNAL plan, so this dumps it.
//   runMain graft.tools.PlanDumpInternal <sfDir> <suffix> <case1,case2> [outDir]
package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.queries.Scratch

object PlanDumpInternal {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val outDir = if (args.length > 3) args(3) else "plans/r19"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val s = df.queryExecution.explainString(FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"), s.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${s.length} chars)")
    }

    for (c <- args(2).split(",").toSeq) c match {
      case "optimize_zcurve" =>
        // the clustered projection OPTIMIZE writes for a 2-col numeric
        // z-order at nFiles > 1 — the q245 / pruning2d hot path
        import graft.tables.{GraftTable, Maintenance}
        val o = Tables.t(spark, sfDir, "orders")
        val t = GraftTable.createFrom(spark, Scratch.dir("plandump-z"), o)
        val clustered = Maintenance.clusterInto(
          t.read(), Seq("o_orderkey", "o_custkey"), nFiles = 16)
        dump("optimize_zcurve_projection", clustered)
      case "dedup_probe" =>
        // the un-cut incremental probe (materializeCandidates=false), the
        // q209/q216/q218 pipeline pre-materialization
        import graft.text.{DedupIndex, DedupOps}
        import graft.tables.GraftTable
        val d = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
        val path = Scratch.dir("plandump-idx")
        DedupIndex.build(d, path, n = 5)
        val reopened = GraftTable.load(spark, path)
        val batch = d.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra token extra2")).as("text"))
        val batchGrams = DedupOps.shingleTable(batch, 5).persist()
        dump("dedup_probe_pipeline", DedupOps.incrementalPipeline(
          reopened.read().select("doc_id", "shingle"), batchGrams, 0.5,
          materializeCandidates = false))
        batchGrams.unpersist()
      case other => sys.error(s"unknown case: $other")
    }
    spark.stop()
  }
}
