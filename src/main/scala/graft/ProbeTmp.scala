package graft

import org.apache.spark.sql.SparkSession

// throwaway profiling main — delete before committing round work
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q56_scd2_merge", "q62_apply_changes_scd2", "q51_merge_clauses",
        "q50_merge_upsert", "q150_incremental_mv", "q57_apply_changes_scd1")
    // the sbt-server JVM may hold a stale session from tests (local[4]) —
    // timings are garbage unless we start clean
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
