package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.tables.{GraftTable, IncrementalMv}

/** Microbench for the MV-rewrite optimizer hot path (dev tool backing
  * SCALING.md): the `RewriteToMv` rule runs on EVERY Aggregate of every
  * query while any MV is registered, so its per-query overhead — not
  * the rewrite itself — is what a production session with many
  * registered MVs pays. Measures catalyst optimize time (forcing
  * `optimizedPlan`, plans built fresh per rep) for:
  *
  *   a. a NON-candidate aggregate (raw testdata scan) with 0 vs 100
  *      registered MVs — the root-path short-circuit's cost: string
  *      compares only, no commit-log IO, no file enumeration;
  *   b. a CANDIDATE aggregate (rewrite fires) repeated — the snapshot
  *      file-set memoization: commit-log normalization paid once per
  *      (source, version), not per query.
  *
  * Usage: runMain graft.tools.ProfMv <sfDir> [nMvs] [reps]
  */
object ProfMv {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfMv <sfDir> [nMvs] [reps]")
    val sfDir = args(0)
    val nMvs = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 30
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profmv")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.queries.Scratch.Root + "/profmv"
    GraftTable.deleteTree(java.nio.file.Paths.get(root))
    val o = graft.Tables.t(spark, sfDir, "orders")

    // one real source+view (the rewrite target) + nMvs−1 decoy MVs over
    // tiny single-row tables: the registry walk is what's under test,
    // not the decoys' content
    val src = GraftTable.createFrom(spark, s"$root/src", o)
    val view = IncrementalMv.create(spark, s"$root/view", src,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    val one = o.limit(1).select(col("o_orderstatus").as("k"),
      col("o_totalprice").as("v"))
    val decoys = (1 until nMvs).map { i =>
      val s = GraftTable.createFrom(spark, s"$root/d$i-src", one)
      val v = IncrementalMv.create(spark, s"$root/d$i-view", s,
        Seq("k"), Seq("v"))
      (s, v)
    }

    def optimizeOnce(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.optimizedPlan // forces analysis + optimization
      (System.nanoTime() - t0) / 1e9
    }
    def nonCandidate() = graft.Tables.t(spark, sfDir, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    def candidate() = src.read()
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame): Double = {
      (1 to 3).foreach(_ => optimizeOnce(mk())) // warm codegen/analysis
      val med = Harness.median((1 to reps).map(_ => optimizeOnce(mk())))
      println(f"[profmv] $tag%-28s median=${med * 1000}%.2f ms (reps=$reps)")
      med
    }

    MvRewrite.clear()
    val base = run("non-candidate, 0 MVs", nonCandidate)
    MvRewrite.enable(spark)
    MvRewrite.register(src, view, Seq("o_orderstatus"), Seq("o_totalprice"))
    decoys.foreach { case (s, v) => MvRewrite.register(s, v, Seq("k"), Seq("v")) }
    val loaded = run(s"non-candidate, $nMvs MVs", nonCandidate)
    val cand = run(s"candidate (rewrite), $nMvs MVs", candidate)
    println(f"[profmv] sfDir=$sfDir nMvs=$nMvs overhead_non_candidate=" +
      f"${(loaded - base) * 1000}%.2f ms candidate=${cand * 1000}%.2f ms")
    MvRewrite.clear()
    GraftTable.deleteTree(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
