package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DLT-style data-quality expectations (`DP/Step 3:43-45`,
  * `LOANS/02-DLT-Loan-pipeline-PYTHON.py:127-142`, `CDC/01:122-126`):
  *
  *  - `expect`       — warn: keep all rows, count violations
  *  - `expectOrDrop` — drop violating rows
  *  - `expectOrFail` — abort the batch when any row violates
  *  - `quarantine`   — route violating rows to a side output
  *
  * Violation counts ride on `observe()` (Spark's built-in metric channel)
  * so they cost no extra pass in either batch or streaming execution.
  */
object Expectations {

  final case class Rule(name: String, predicate: String,
      mode: String /* warn | drop | fail */)

  def expect(name: String, predicate: String): Rule = Rule(name, predicate, "warn")
  def expectOrDrop(name: String, predicate: String): Rule = Rule(name, predicate, "drop")
  def expectOrFail(name: String, predicate: String): Rule = Rule(name, predicate, "fail")

  final class ExpectationFailedException(msg: String) extends RuntimeException(msg)

  /** Apply rules: returns the retained DataFrame with an `observe` metric
    * `violations_<rule>` per rule. `fail` rules are checked eagerly (one
    * count job) in batch mode. */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val failRules = rules.filter(_.mode == "fail")
    failRules.foreach { r =>
      val bad = df.filter(not(expr(r.predicate))).limit(1).count()
      if (bad > 0) throw new ExpectationFailedException(
        s"expectation '${r.name}' violated: ${r.predicate}")
    }
    val metrics: Seq[Column] = rules.map(r =>
      sum(when(not(expr(r.predicate)), 1L).otherwise(0L)).as(s"violations_${r.name}"))
    val observed =
      if (metrics.isEmpty) df
      else df.observe("expectations", metrics.head, metrics.tail: _*)
    rules.filter(_.mode == "drop")
      .foldLeft(observed)((d, r) => d.filter(expr(r.predicate)))
  }

  /** Split into (passing, quarantined) by the conjunction of predicates
    * (`LOANS/02:136-142` inverse-expectations pattern). */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val all = rules.map(r => expr(r.predicate)).reduce(_ && _)
    (df.filter(all), df.filter(not(all)))
  }

  /** Per-rule violation/retention report as a DataFrame (one count pass —
    * used by the event-log analytics queries, `LOANS/03:88-104`). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = rules.map(r =>
      sum(when(not(expr(r.predicate)), 1L).otherwise(0L)).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = df.count()
    rules.zipWithIndex.map { case (r, i) =>
      (r.name, r.mode, row.getLong(i), total - row.getLong(i))
    }.toDF("rule", "mode", "violations", "passed")
  }
}
