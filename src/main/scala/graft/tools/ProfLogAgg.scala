package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.{GraftTable, LogAgg, MergeOps}

/** A/B for the streaming corpus-stats maintenance shape (dev tool
  * backing SCALING.md / q270): per-batch MERGE of (lang, word) count
  * deltas into a stats table vs append-only LogAgg deltas with cadence
  * compaction. Reports per-batch wall time and — the point — FILES
  * REWRITTEN per batch: a uniform vocabulary delta defeats merge
  * key-range pruning, so the MERGE arm rewrites ~the whole stats table
  * every batch, while the append arm rewrites zero (compaction pays the
  * fold once per cadence). Both arms end with identical aggregates
  * (checked here; q270's oracle gates the streaming form).
  *
  * Usage: runMain graft.tools.ProfLogAgg <dir> [nBatches] [cadence]
  */
object ProfLogAgg {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfLogAgg <dir> [nBatches] [cadence]")
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val cadence = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-proflogagg")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.t(spark, dir, "documents")
      .select("lang", "doc_id", "text")
    docs.count() // warm file listing
    val schema = StructType(Seq(
      StructField("lang", StringType), StructField("word", StringType),
      StructField("n", LongType)))
    def deltaOf(b: Int): DataFrame = docs
      .filter(col("doc_id") % nBatches === b)
      .select(col("lang"),
        explode(graft.text.TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))

    def tm(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val root = graft.queries.Scratch.Root + "/proflogagg"
    GraftTable.deleteTree(java.nio.file.Paths.get(root))

    // arm A: per-batch MERGE accumulation
    val mt = GraftTable.create(spark, s"$root/merge", schema)
    val mergeTimes = (0 until nBatches).map { b =>
      tm {
        MergeOps.mergeInto(mt, deltaOf(b),
          "target.lang = source.lang AND target.word = source.word",
          matched = Seq(MergeOps.WhenMatched(None,
            MergeOps.UpdateSet(Map("n" -> "target.n + source.n")))),
          notMatched = Seq(MergeOps.WhenNotMatched(None, MergeOps.InsertAll)))
      }
    }
    val mergeRewrites = mt.commits.filter(_.operation == "MERGE")
      .map(_.removedFiles.size)

    // arm B: LogAgg append + cadence compaction
    val lt = LogAgg.create(spark, s"$root/logagg", schema,
      Seq("lang", "word"), Seq("n"))
    val logTimes = (0 until nBatches).map { b =>
      tm { LogAgg.append(lt, deltaOf(b)); LogAgg.compactIfDue(lt, cadence) }
    }
    val logRewrites = lt.commits
      .filter(c => c.operation == "LOGAGG DELTA" || c.operation == "LOGAGG COMPACT")
      .map(c => s"${c.operation.split(" ")(1).toLowerCase}:${c.removedFiles.size}")

    // identical final aggregate or the A/B is void
    val a = mt.read().orderBy("lang", "word").collect().toSeq
    val b = LogAgg.read(lt).orderBy("lang", "word").collect().toSeq
    require(a == b, "arms diverged — A/B void")

    println(f"[proflogagg] dir=$dir batches=$nBatches cadence=$cadence " +
      f"statsRows=${a.size}")
    println(f"[proflogagg] merge  total=${mergeTimes.sum}%.2f s " +
      f"perBatch=${mergeTimes.map(t => f"$t%.2f").mkString(" ")} " +
      f"filesRewrittenPerBatch=${mergeRewrites.mkString(" ")}")
    println(f"[proflogagg] logagg total=${logTimes.sum}%.2f s " +
      f"perBatch=${logTimes.map(t => f"$t%.2f").mkString(" ")} " +
      f"filesRewritten=${logRewrites.mkString(" ")}")
    spark.stop()
  }
}
