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
/** Phase attribution for the OPTIMIZE ZORDER gate (q58): times the
  * gate's four phases separately — createFrom (write #1), the
  * approxQuantile bucket sketch, the z-clustered rewrite (shuffle +
  * sort + write #2), and the final read+sort output scan — so a bench
  * regression can be charged to a specific phase instead of
  * re-litigated as a total. Usage: runMain graft.tools.ProfOptimize
  * <sfDir> [reps]. */
object ProfOptimize {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.t(spark, sfDir, "lineitem")
    li.count() // warm
    def tm[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to reps) {
      val path = graft.queries.Scratch.dir("profopt")
      val (tbl, tCreate) = tm(
        graft.tables.GraftTable.createFrom(spark, path, li))
      // the sketch phase runs inside optimize; time it standalone on the
      // same projection optimize uses (its cost is additive)
      val (_, tSketch) = tm(
        tbl.read().select(
            org.apache.spark.sql.functions.col("l_shipdate").cast("double"),
            org.apache.spark.sql.functions.col("l_orderkey").cast("double"))
          .stat.approxQuantile(Array("l_shipdate", "l_orderkey"),
            (1 until 256).map(_.toDouble / 256).toArray, 0.001))
      val (_, tOpt) = tm(graft.tables.Maintenance.optimize(
        tbl, zorderBy = Seq("l_shipdate", "l_orderkey")))
      val (_, tRead) = tm(
        tbl.read().select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber")
          .write.format("noop").mode("overwrite").save())
      println(f"[profopt] rep$rep createFrom=$tCreate%.2fs sketch=$tSketch%.2fs " +
        f"optimize(sketch+cluster+write)=$tOpt%.2fs readSort=$tRead%.2fs " +
        f"total=${tCreate + tOpt + tRead}%.2fs")
      graft.tables.GraftTable.deleteTree(java.nio.file.Paths.get(path))
    }
    spark.stop()
  }
}

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
