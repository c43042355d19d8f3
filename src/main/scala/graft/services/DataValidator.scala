package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential table validation (`HF/datavalidator.py:18-254`): hash every
  * row (sha2-512 of null-normalized concatenated values), then diff two
  * tables with anti/semi joins — match counts, percentage difference, and
  * the actual mismatched rows.
  *
  * Scale: the hash is computed in the scan projection (codegen); the diff
  * is a shuffle on the 128-char hash — uniformly distributed, so no skew.
  * Broadcast is disabled for the diff joins in the reference
  * (`autoBroadcastJoinThreshold=-1`) because both sides are large; we let
  * AQE decide instead.
  */
object DataValidator {

  /** Row hash: sha2-512 over null-normalized (`COALESCE(cast,'')`) values
    * of `cols` (default: all columns, sorted for stability). */
  def withRowHash(df: DataFrame, cols: Seq[String] = Nil,
      hashCol: String = "sha_hash"): DataFrame = {
    val use = if (cols.nonEmpty) cols else df.columns.sorted.toSeq
    val normalized: Seq[Column] =
      use.map(c => coalesce(col(c).cast("string"), lit("")))
    df.withColumn(hashCol, sha2(concat_ws("§", normalized: _*), 512))
  }

  final case class ValidationReport(
      rowsA: Long, rowsB: Long, matched: Long,
      onlyInA: Long, onlyInB: Long, pctMatch: Double)

  /** Hash-diff two DataFrames on `cols` (all columns when empty). */
  def compare(a: DataFrame, b: DataFrame, cols: Seq[String] = Nil): ValidationReport = {
    val ha = withRowHash(a, cols).select("sha_hash")
    val hb = withRowHash(b, cols).select("sha_hash")
    val rowsA = ha.count(); val rowsB = hb.count()
    val matched = ha.join(hb, Seq("sha_hash"), "left_semi").count()
    val onlyA = ha.join(hb, Seq("sha_hash"), "left_anti").count()
    val onlyB = hb.join(ha, Seq("sha_hash"), "left_anti").count()
    ValidationReport(rowsA, rowsB, matched, onlyA, onlyB,
      if (rowsA == 0) 100.0 else matched.toDouble * 100.0 / rowsA)
  }

  /** Rows of `a` with no hash-matching row in `b` (LEFT ANTI,
    * `HF/datavalidator.py:162-171`). */
  def mismatchedRows(a: DataFrame, b: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val ha = withRowHash(a, cols)
    val hb = withRowHash(b, cols).select("sha_hash")
    ha.join(hb, Seq("sha_hash"), "left_anti").drop("sha_hash")
  }

  def reportDF(a: DataFrame, b: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val r = compare(a, b, cols)
    Seq((r.rowsA, r.rowsB, r.matched, r.onlyInA, r.onlyInB,
      math.round((r.pctMatch + 1e-9) * 100.0) / 100.0))
      .toDF("rows_a", "rows_b", "matched", "only_in_a", "only_in_b", "pct_match")
  }
}
