package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** SCALING.md attribution experiment for q81 (dev tool):
  * `exactPairsWithinKey` is all-pairs WITHIN each blocking-key group, so
  * its work is Σ|group|² — the q81 gate blocks on `label` (10 values),
  * whose groups grow linearly with the corpus, making the gate
  * quadratic BY ITS OWN SEMANTICS (the qualifying-pair output itself
  * grows quadratically). This tool times the same operator on the same
  * data with a constant-occupancy key (~200 vectors per group, the
  * 100 TB blocking discipline — an LSH bucket or cluster id): work and
  * output then scale linearly, isolating the growth to the key choice,
  * not the operator.
  *
  * Usage: runMain graft.tools.ProfPairs <dirSmall> <dirLarge>
  */
object ProfPairs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfPairs <dirSmall> <dirLarge>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profpairs")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    def median(xs: Seq[Double]): Double = Harness.median(xs)
    val res = Seq(args(0), args(1)).map { dir =>
      val emb = graft.Tables.t(spark, dir, "embeddings")
      val n = emb.count()
      // constant-occupancy blocking key: ~200 vectors per group
      val keyed = emb.withColumn("bucket",
        pmod(xxhash64(col("vec_id")), lit(math.max(n / 200L, 1L))))
      val times = (1 to repeat).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val pairs = VectorOps.exactPairsWithinKey(keyed, "bucket", 0.35,
          blockSize = 200,
          dotFn = (a, b) => graft.functions.DotProduct.dot_product(spark, a, b))
        val c = pairs.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      (n, median(times.map(_._1)), times.head._2)
    }
    val Seq((nA, tA, cA), (nB, tB, cB)) = res
    println(f"[profpairs] constant-occupancy key: n=$nA%d ${tA}%.2f s ($cA pairs) -> " +
      f"n=$nB%d ${tB}%.2f s ($cB pairs)  time ratio ${tB / tA}%.2f, " +
      f"n ratio ${nB.toDouble / nA}%.1f")
    spark.stop()
  }
}
