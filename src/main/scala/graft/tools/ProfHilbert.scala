package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.{GraftTable, Maintenance}

/** Box-query pruning A/B across the three 2-D layouts (dev tool backing
  * BASELINE.md): the same lineitem copy laid out by lexicographic
  * range-cluster, z-curve, and Hilbert curve, probed with the Bench
  * pruning2d box workload (five ~1/8-per-dimension boxes at staggered
  * offsets) — reporting files read per layout. The claim under test:
  * Hilbert ≤ z-curve ≤ range, because consecutive Hilbert positions are
  * always adjacent cells (no quadrant-seam jumps), so a bucket
  * rectangle maps to fewer disjoint curve ranges and fewer files.
  *
  * Usage: runMain graft.tools.ProfHilbert <sfDir> [targetFileKb]
  */
object ProfHilbert {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfHilbert <sfDir> [targetFileKb]")
    val sfDir = args(0)
    val targetKb = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profhilbert")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.Tables.t(spark, sfDir, "lineitem")
    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (okLo, okHi, pkLo, pkHi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def pct(lo: Long, hi: Long, f: Double): Long = lo + ((hi - lo) * f).toLong
    val preds = Seq(0.05, 0.25, 0.45, 0.65, 0.85).map { f =>
      s"l_orderkey >= ${pct(okLo, okHi, f)} AND l_orderkey <= ${pct(okLo, okHi, f + 0.125)} AND " +
        s"l_partkey >= ${pct(pkLo, pkHi, f)} AND l_partkey <= ${pct(pkLo, pkHi, f + 0.125)}"
    }
    val root = graft.queries.Scratch.Root + "/profhilbert"
    GraftTable.deleteTree(java.nio.file.Paths.get(root))
    def layout(name: String, interleave: Boolean, curve: String): (Int, Int) = {
      val t = GraftTable.createFrom(spark, s"$root/$name", li)
      t.setProperties(Map("graft.targetFileSize" -> (targetKb * 1024L).toString))
      Maintenance.optimize(t, zorderBy = Seq("l_orderkey", "l_partkey"),
        interleave = interleave, curve = curve)
      (preds.map(p => t.pruneFiles(p)._1.size).sum, t.pruneFiles(preds.head)._2)
    }
    val (rangeKept, total) = layout("range", interleave = false, curve = "z")
    val (zKept, _) = layout("z", interleave = true, curve = "z")
    val (hKept, _) = layout("hilbert", interleave = true, curve = "hilbert")
    println(s"[profhilbert] sfDir=$sfDir files/layout=$total boxes=${preds.size} " +
      s"filesRead: range=$rangeKept z=$zKept hilbert=$hKept")

    // 3-D: same staggered-box workload over (orderkey, partkey, suppkey)
    // — the Skilling-transform layout vs the 3-dim z-curve. Box sides
    // widen to ~1/4 per dimension (1/8³ of a small SF selects so few
    // rows every layout reads 1 file and the comparison degenerates).
    val r3 = li.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (skLo, skHi) = (r3.getLong(0), r3.getLong(1))
    val preds3 = Seq(0.05, 0.25, 0.45, 0.65).map { f =>
      s"l_orderkey >= ${pct(okLo, okHi, f)} AND l_orderkey <= ${pct(okLo, okHi, f + 0.25)} AND " +
        s"l_partkey >= ${pct(pkLo, pkHi, f)} AND l_partkey <= ${pct(pkLo, pkHi, f + 0.25)} AND " +
        s"l_suppkey >= ${pct(skLo, skHi, f)} AND l_suppkey <= ${pct(skLo, skHi, f + 0.25)}"
    }
    def layout3(name: String, curve: String): (Int, Int) = {
      val t = GraftTable.createFrom(spark, s"$root/$name", li)
      t.setProperties(Map("graft.targetFileSize" -> (targetKb * 1024L).toString))
      Maintenance.optimize(t,
        zorderBy = Seq("l_orderkey", "l_partkey", "l_suppkey"), curve = curve)
      (preds3.map(p => t.pruneFiles(p)._1.size).sum, t.pruneFiles(preds3.head)._2)
    }
    val (z3Kept, total3) = layout3("z3", curve = "z")
    val (h3Kept, _) = layout3("hilbert3", curve = "hilbert")
    println(s"[profhilbert] 3d files/layout=$total3 boxes=${preds3.size} " +
      s"filesRead: z=$z3Kept hilbert=$h3Kept")
    spark.stop()
  }
}
