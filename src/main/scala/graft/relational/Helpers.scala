package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's canonical relational idioms as first-class API
  * (SURVEY.md §5 "relational" module).
  */
object Helpers {

  /** ROW_NUMBER dedup: latest row per key by `orderCols` descending — the
    * idiom behind every reference merge-dedup stage (`DP/Step 1:184-190`,
    * `DP/Step 5:218-262`, `DP/Step 12:177`). Shuffles once on the keys. */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** High-watermark value of `col` (`COALESCE(MAX(..), floor)` pattern,
    * `DP/Step 6:119-252`). One driver-side scalar — the only collect. */
  def highWatermark(df: DataFrame, c: String, floor: Any = null): Option[Any] = {
    val v = df.agg(max(col(c))).head().get(0)
    Option(if (v == null) floor else v)
  }

  /** Incremental slice: rows strictly after the stored watermark
    * (`WHERE processed_watermark > (SELECT high_watermark ...)`). */
  def incrementalAfter(df: DataFrame, c: String, watermark: Option[Any]): DataFrame =
    watermark.map(w => df.filter(col(c) > lit(w))).getOrElse(df)

  /** Rank-then-limit top-k per group (`DP/Step 14:164-171`): dense_rank
    * over the group ordering, keep ranks ≤ k. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCol.desc)
    df.withColumn("__rnk", dense_rank().over(w))
      .filter(col("__rnk") <= k)
      .withColumnRenamed("__rnk", "rank")
  }
}
