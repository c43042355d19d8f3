// dev scratch — not part of the library; captures .explain("formatted") for
// the optimization-round plan evidence: runMain graft.tools.PlanDump
//   <sfDir> <suffix> <q1,q2,...> [outDir]  → plans/r19/<query>_<suffix>.txt
package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

import graft.{GraftSession, SparkEntry}

object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <suffix> <q1,q2,...>")
    val outDir = if (args.length > 3) args(3) else "plans/r19"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (q <- args(2).split(",").toSeq) {
      val df = SparkEntry.queries(q)(spark, args(0))
      // materialize once so AQE final plans (join strategy picks) are real
      df.write.format("noop").mode("overwrite").save()
      val s = df.queryExecution.explainString(FormattedMode)
      Files.write(Paths.get(s"$outDir/${q}_${args(1)}.txt"), s.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${q}_${args(1)}.txt (${s.length} chars)")
    }
    spark.stop()
  }
}
