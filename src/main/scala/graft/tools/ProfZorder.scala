package graft.tools

import org.apache.spark.sql.SparkSession

import graft.tables.{GraftTable, Maintenance}

/** SCALING.md attribution experiment for q121 (dev tool): the gate
  * OPTIMIZEs lineitem with a FIXED 256 KB targetFileSize, so the
  * post-OPTIMIZE file count grows linearly with the table (60 M rows →
  * ~7,000 files) and constant-per-file costs (open/close, footer +
  * stats harvest, commit-log entry) swamp the sort. This tool runs the
  * same createFrom → ZORDER → pruned-read flow with the file SIZE
  * scaled to the table (constant ~32-file layout — the 100 TB
  * discipline: files are 128 MB–1 GB, file COUNT tracks cluster
  * parallelism, not a fixed byte constant), isolating the growth to
  * the gate's constant, not the operator.
  *
  * Usage: runMain graft.tools.ProfZorder <dirSmall> <dirLarge> [fileBytes]
  *
  * The optional `fileBytes` fixes targetFileSize to the SAME absolute
  * value on both legs, so file COUNT (= sort partition count) grows
  * with the table — per-sort-task work stays constant, exactly how a
  * cluster absorbs a decade (10× data → 10× executors → same work per
  * wave slot). Without it each leg gets bytes/32, which 10×es the
  * per-task sort and measures single-box spill on top of the operator.
  */
object ProfZorder {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfZorder <dirSmall> <dirLarge> [fileBytes]")
    val fixedFileBytes: Option[Long] =
      if (args.length > 2) Some(args(2).toLong) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profzorder")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = Seq(args(0), args(1)).map { dir =>
      val li = graft.Tables.t(spark, dir, "lineitem")
      val p = java.nio.file.Files.createTempDirectory("profzorder")
      val t0 = System.nanoTime()
      val t = GraftTable.createFrom(spark, s"$p/t", li)
      val bytes = t.filesAt()
        .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
      t.setProperties(Map("graft.targetFileSize" ->
        fixedFileBytes.getOrElse(math.max(bytes / 32, 256 * 1024)).toString))
      val t1 = System.nanoTime()
      Maintenance.optimize(t, zorderBy = Seq("l_orderkey"))
      val t2 = System.nanoTime()
      val n = t.readWhere("l_orderkey <= 100").count()
      val t3 = System.nanoTime()
      val files = t.filesAt().size
      GraftTable.deleteTree(p)
      (bytes, files, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, n)
    }
    val Seq((bA, fA, wA, zA, rA, _), (bB, fB, wB, zB, rB, _)) = res
    println(f"[profzorder] small: ${bA / 1e6}%.0f MB/$fA files  write $wA%.2f s  zorder $zA%.2f s  prunedRead $rA%.2f s")
    println(f"[profzorder] large: ${bB / 1e6}%.0f MB/$fB files  write $wB%.2f s  zorder $zB%.2f s  prunedRead $rB%.2f s")
    println(f"[profzorder] zorder ratio ${zB / zA}%.2f, end-to-end ratio ${(wB + zB + rB) / (wA + zA + rA)}%.2f, bytes ratio ${bB.toDouble / bA}%.1f")
    spark.stop()
  }
}
