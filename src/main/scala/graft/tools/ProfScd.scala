package graft.tools

import graft.{GraftSession, Tables}
import graft.tables.{GraftTable, Scd}
import graft.queries.Scd2AcDemo

/** Temporary phase-level profile of q62_apply_changes_scd2. Drives the
  * SAME workload definition as the gate (`queries.Scd2AcDemo`) so it can
  * never measure a stale copy, and scratches under its own subtree so it
  * is safe to run while Bench/Verify own `Scratch.Root`.
  */
object ProfScd {
  private val Root = "/root/repo/target/profscd"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    def tm(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profscd] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (rep <- 1 to reps) {
      GraftTable.deleteTree(java.nio.file.Paths.get(Root))
      println(s"[profscd] === rep $rep ===")
      val (b1, b2) = Scd2AcDemo.batches(spark, sfDir)
      var tbl: GraftTable = null
      tm("create") { tbl = GraftTable.create(spark, s"$Root/scd2ac", Scd2AcDemo.schema) }
      tm("batch1") { Scd.applyChangesScd2(tbl, b1, Seq("user_id"), "ts") }
      tm("batch2") { Scd.applyChangesScd2(tbl, b2, Seq("user_id"), "ts") }
      tm("readout") { tbl.read().orderBy("user_id", "_start_at")
        .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
