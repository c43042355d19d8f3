package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative table-level constraint verification (the Deequ-shaped
  * "unit tests for data" report): a suite of named checks evaluates to
  * one row per check — metric, threshold, pass/fail — so a pipeline
  * can gate a release on `report.filter(!passed).isEmpty` and a human
  * can read WHY a snapshot was rejected. Complements the row-level DLT
  * expectations (`streaming/Expectations`): those tag/drop individual
  * rows in-flight; this audits a finished table.
  *
  * Scale shape: every non-containment check compiles to ONE aggregate
  * expression over a single shared scan (completeness, range
  * conformance, and each uniqueness check's distinct count all ride
  * the same pass — Spark plans multi-distinct via expand, cost
  * ∝ checks, not scans); each containment check adds one left-join
  * ratio against its (typically dimension-sized, broadcast-able)
  * reference. Output is checks-cardinality rows.
  */
object TableCheck {

  sealed trait Check {
    def name: String
    def column: String
    def minRatio: Double
  }

  /** Fraction of rows with a non-null `column` ≥ minRatio. */
  final case class Completeness(column: String, minRatio: Double = 1.0)
      extends Check { val name = "completeness" }

  /** distinct(column) / count ≥ minRatio (1.0 = unique key). */
  final case class Uniqueness(column: String, minRatio: Double = 1.0)
      extends Check { val name = "uniqueness" }

  /** Fraction of non-null values inside [lo, hi] ≥ minRatio. */
  final case class InRange(column: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Check { val name = "in_range" }

  /** Fraction of non-null values present in `ref`'s `refColumn` ≥
    * minRatio (referential integrity; ref is usually a dimension —
    * broadcast). */
  final case class Containment(column: String, ref: DataFrame,
      refColumn: String, minRatio: Double = 1.0) extends Check {
    val name = "containment"
  }

  /** Evaluate the suite: one row per check —
    * (check, column, metric, min_ratio, passed). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val (scanChecks, joinChecks) = checks.partition {
      case _: Containment => false
      case _ => true
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: scanChecks.zipWithIndex.map {
      // sum() over zero rows is NULL — coalesce so an empty table reads
      // vacuously conformant instead of NPEing the report
      case (Completeness(c, _), i) =>
        coalesce(sum(when(col(c).isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__m$i")
      case (Uniqueness(c, _), i) => countDistinct(col(c)).as(s"__m$i")
      case (InRange(c, lo, hi, _), i) =>
        coalesce(sum(when(col(c).isNotNull &&
          col(c).cast("double").between(lo, hi), 1L).otherwise(0L)), lit(0L))
          .as(s"__m$i")
      case (other, _) => throw new IllegalStateException(other.name)
    }
    // each InRange carries its OWN non-null-count aggregate (same shared
    // scan pass, `count(col)` skips nulls natively): its denominator must
    // never depend on whether an unrelated Completeness check for the
    // same column happens to be in the suite — a check's metric is a
    // function of the data, not of suite composition (review finding)
    val denomAggs: Seq[(Int, Column)] = scanChecks.zipWithIndex.collect {
      case (InRange(c, _, _, _), i) => i -> count(col(c)).as(s"__d$i")
    }
    val allAggs = aggs ++ denomAggs.map(_._2)
    val row = df.agg(allAggs.head, allAggs.tail: _*).head()
    val n = row.getLong(0).toDouble
    val denomIdx = denomAggs.map(_._1).zipWithIndex
      .map { case (i, k) => i -> (aggs.size + k) }.toMap
    val scanRows = scanChecks.zipWithIndex.map { case (chk, i) =>
      val m = row.getLong(i + 1)
      val denom = chk match {
        // range conformance is over NON-NULL values: a null is a
        // completeness failure, not a range one
        case _: InRange => row.getLong(denomIdx(i)).toDouble
        case _ => n
      }
      val metric = if (denom == 0) 1.0 else m / denom
      (chk.name, chk.column, metric, chk.minRatio)
    }
    val joinRows = joinChecks.map { case Containment(c, ref, rc, minR) =>
      val vals = df.filter(col(c).isNotNull)
      val total = vals.count().toDouble
      val matched = vals
        .join(broadcast(ref.select(col(rc).as(c)).distinct()), Seq(c),
          "left_semi").count().toDouble
      val metric = if (total == 0) 1.0 else matched / total
      ("containment", c, metric, minR)
    }
    val spark = df.sparkSession
    import spark.implicits._
    (scanRows ++ joinRows)
      .map { case (nm, c, m, t) =>
        (nm, c, BigDecimal(m + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, t, m + 1e-9 >= t)
      }
      .toDF("check", "column", "metric", "min_ratio", "passed")
  }
}
