package graft.tools

import org.apache.spark.sql.SparkSession

import graft.text.Bpe

/** A/B microbench for the BPE encode paths (dev tool backing
  * SCALING.md): times `Bpe.tokenStats` with and without the fastBPE
  * word-segmentation cache over the SAME corpus, ALTERNATING the two
  * arms rep by rep (A B A B …) so ambient drift hits both equally —
  * the ProfMedia alternation discipline. Also times the train step so
  * the cache's extra dict scan is charged visibly.
  *
  * What the cache changes: the direct arm runs the min-rank encode loop
  * per word OCCURRENCE (corpus-scale); the cached arm runs it once per
  * DISTINCT word (vocabulary-scale, driver-side) and turns the per-row
  * UDF into a hash lookup. On a bounded-vocabulary corpus the win is
  * the occurrence/type ratio; on a Heap's-law corpus it decays as the
  * dict grows — measure, don't guess.
  *
  * Usage: runMain graft.tools.ProfTok <dir> [nMerges] [reps]
  */
object ProfTok {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfTok <dir> [nMerges] [reps]")
    val dir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-proftok")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.t(spark, dir, "documents")
    docs.count() // warm file listing

    def tm(f: => Unit): Double = {
      Harness.resetRunState(spark)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val tTrain = tm { Bpe.train(docs, nMerges) }
    val merges = Bpe.train(docs, nMerges)
    val dictSize = Bpe.wordFreq(docs).count()

    // trainer A/B on the SAME collected dict: incremental delta-update
    // pair maintenance vs the full-recount reference, alternating —
    // the asymptotic claim is recount O(nMerges × Σ|word|) vs
    // incremental O(Σ|affected|) per merge
    val dict = Bpe.wordFreq(docs).orderBy("word").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    def tmPure(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val trainPairs = (1 to reps).map { _ =>
      (tmPure(Bpe.trainFromDictRecount(dict, nMerges)),
        tmPure(Bpe.trainFromDict(dict, nMerges)))
    }
    val tRecount = Harness.median(trainPairs.map(_._1))
    val tIncr = Harness.median(trainPairs.map(_._2))
    println(f"[proftok] trainer A/B nMerges=$nMerges dict=${dict.size}: " +
      f"recount=$tRecount%.2f s incremental=$tIncr%.2f s " +
      f"ratio=${tRecount / tIncr}%.2f " +
      f"(reps: ${trainPairs.map(p => f"${p._1}%.2f/${p._2}%.2f").mkString(" ")})")

    def runArm(cache: Boolean): Unit =
      Bpe.tokenStats(docs, merges, cacheWords = cache)
        .write.format("noop").mode("overwrite").save()

    // alternating A/B: direct, cached, direct, cached, ...
    val pairs = (1 to reps).map { _ => (tm(runArm(false)), tm(runArm(true))) }
    val direct = Harness.median(pairs.map(_._1))
    val cached = Harness.median(pairs.map(_._2))
    println(f"[proftok] dir=$dir nMerges=$nMerges dict=$dictSize " +
      f"train=$tTrain%.2f s")
    println(f"[proftok] direct=${direct}%.2f s cached=${cached}%.2f s " +
      f"ratio=${direct / cached}%.2f " +
      f"(reps: ${pairs.map(p => f"${p._1}%.2f/${p._2}%.2f").mkString(" ")})")
    spark.stop()
  }
}
