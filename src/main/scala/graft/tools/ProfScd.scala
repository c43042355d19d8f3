package graft.tools

import graft.{GraftSession, Tables}
import graft.tables.{GraftTable, Scd}
import org.apache.spark.sql.functions._

/** Temporary phase-level profile of q62_apply_changes_scd2. */
object ProfScd {
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
      graft.tables.GraftTable.deleteTree(
        java.nio.file.Paths.get(graft.queries.Scratch.Root))
      println(s"[profscd] === rep $rep ===")
      val ev = Tables.t(spark, sfDir, "events").select("user_id", "value", "ts")
      val mid = "2024-01-08 00:00:00"
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("_start_at", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("_end_at", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("_is_current", org.apache.spark.sql.types.BooleanType)))
      var tbl: GraftTable = null
      tm("create") { tbl = GraftTable.create(spark,
        graft.queries.Scratch.dir("scd2ac"), schema) }
      tm("batch1") { Scd.applyChangesScd2(tbl,
        ev.filter(col("ts") < lit(mid).cast("timestamp")), Seq("user_id"), "ts") }
      tm("batch2") { Scd.applyChangesScd2(tbl,
        ev.filter(col("ts") >= lit(mid).cast("timestamp")), Seq("user_id"), "ts") }
      tm("readout") { tbl.read().orderBy("user_id", "_start_at")
        .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
