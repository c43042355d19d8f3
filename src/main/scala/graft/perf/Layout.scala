package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for shuffle minimization at scale
  * (SURVEY.md §4): salted joins for skewed keys and bucketed tables for
  * exchange-free co-located joins.
  *
  * AQE's skew-join split handles most skew automatically; `saltedJoin` is
  * the explicit variant for pathological single-key skew (one key holding
  * >1 partition budget) where pre-splitting beats runtime re-planning.
  */
object Layout {

  /** Inner equi-join where `big`'s `key` is heavily skewed: `big` rows get
    * a random salt in [0, saltFactor); `small` is replicated saltFactor
    * times, so the hot key spreads over saltFactor reducers. Result equals
    * the plain join (asserted in LayoutSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val bigS = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a bucketed+sorted table (catalog-managed): joins/aggregations
    * on the bucket key between co-bucketed tables plan without a shuffle
    * exchange. `spark.table(name)` reads it back. */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  /** True when the physical plan of `df` contains no shuffle exchange
    * (diagnostic for co-located join verification). */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
