package graft

// throwaway profiling main — delete before committing round work
object ProfR4 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q74_ngram_jaccard", "q75_minhash_lsh", "q76_simhash")
    val s = GraftSession.local()
    val qs = SparkEntry.queries
    qs("q01_pricing_summary")(s, sf).collect() // warm
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      qs(n)(s, sf).write.format("noop").mode("overwrite").save()
      println(f"[prof] $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
  }
}
