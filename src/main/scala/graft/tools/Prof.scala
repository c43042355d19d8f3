package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Maintained profiling entry point: time individual catalogued queries
  * against any sf directory without running the full Bench suite.
  *
  * Usage: runMain graft.tools.Prof <sfDir> <name1,name2,...> [reps]
  *
  * Each query is executed through the same noop-sink path Bench uses, after
  * a one-query warm-up, and reports per-rep wall seconds. Use this to chase
  * a single bench regression with fast iteration (Bench itself costs ~7 min
  * at sf0.1).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Prof <sfDir> <name1,name2,...> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count()) // warm
    for (n <- names; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
