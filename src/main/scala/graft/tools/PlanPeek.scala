// dev scratch — not part of the library; run with: sbt 'runMain graft.tools.PlanPeek'
package graft.tools

import graft.{GraftSession, SparkEntry}

object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.001"
    for (q <- args.headOption.map(_.split(",").toSeq).getOrElse(Seq("q233_bm25_topk"))) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      println(s"==== $q ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
