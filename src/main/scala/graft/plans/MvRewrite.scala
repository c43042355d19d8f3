package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.types.DoubleType

import graft.tables.GraftTable

/** Automatic materialized-view rewrite — a Catalyst `Rule[LogicalPlan]`
  * that makes [[graft.tables.IncrementalMv]] views TRANSPARENT: a
  * grouped count/sum/avg aggregate scanning a registered source table
  * is rewritten to re-aggregate the (key-cardinality) view instead of
  * the (corpus-scale) source, exactly when the view is FRESH
  * (appliedVersion == the source's current version — a stale view
  * silently disables the rewrite rather than serving wrong rows).
  * This is the half of the reference's ST/MV story the refresh
  * orchestrator can't give you: the query author doesn't have to KNOW
  * the view exists, which is how warehouse MV rewrite (and Databricks
  * MV routing) actually ships.
  *
  * Rewrite preconditions, all structural (anything else leaves the
  * plan untouched):
  *   - the aggregate's child is a pure column projection over a
  *     parquet scan whose FILE SET equals the registered source's
  *     current snapshot (alias-free Projects only — a rename could
  *     smuggle a different column under a key's name);
  *   - grouping keys ⊆ the view's keys (subset ⇒ rollup re-aggregation
  *     is exact for count/sum, and avg derives as sum/cnt);
  *   - every aggregate is count(lit), sum(col ∈ sumCols) or
  *     avg(col ∈ sumCols), non-DISTINCT, un-FILTERed, with matching
  *     result type.
  *
  * The replacement plan re-aggregates the view (`sum(cnt)`,
  * `sum(sum_c)`) and projects onto the ORIGINAL output attribute ids,
  * so parent operators never notice. Semantics are oracle-gated
  * (q278 compares against DuckDB over the raw data); the mechanism —
  * view files scanned instead of source, staleness disabling, refresh
  * re-enabling — is pinned in MvRewriteSpec.
  */
object MvRewrite {

  final case class MvEntry(source: GraftTable, view: GraftTable,
      keys: Seq[String], sumCols: Seq[String])

  private val registry = TrieMap.empty[String, MvEntry]

  private def norm(p: String): String = {
    val s = if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    java.nio.file.Paths.get(s).toAbsolutePath.normalize.toString
  }

  /** Register a source → view mapping (idempotent by source path). */
  def register(source: GraftTable, view: GraftTable,
      keys: Seq[String], sumCols: Seq[String]): Unit =
    registry.put(norm(source.path), MvEntry(source, view, keys, sumCols))

  def unregister(source: GraftTable): Unit = registry.remove(norm(source.path))
  def clear(): Unit = registry.clear()

  /** Install the rule on `spark` (idempotent). Uses
    * `experimental.extraOptimizations` — the public session-level hook
    * for optimizer rules, running after the built-in batches. */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RewriteToMv]))
      spark.experimental.extraOptimizations = cur :+ RewriteToMv(spark)
  }

  /** The entry whose CURRENT snapshot file set equals `files`, if its
    * view is fresh. */
  private def freshEntryFor(files: Set[String]): Option[MvEntry] =
    registry.values.find { e =>
      e.source.filesAt().map(norm).toSet == files &&
        e.view.properties.get("graft.mv.appliedVersion")
          .exists(_.toLong == e.source.currentVersion)
    }

  final case class RewriteToMv(spark: SparkSession) extends Rule[LogicalPlan] {

    /** The scan's file set, when the child is a pure alias-free column
      * projection over one parquet relation (no filters — a filtered
      * rewrite would need the predicate to be key-only; out of scope). */
    private def scanFiles(child: LogicalPlan): Option[Set[String]] =
      child match {
        case PhysicalOperation(projects, Nil, l: LogicalRelation)
            if projects.forall(_.isInstanceOf[AttributeReference]) =>
          l.relation match {
            case fs: HadoopFsRelation =>
              Some(fs.location.inputFiles.map(norm).toSet)
            case _ => None
          }
        case _ => None
      }

    /** Null when some aggregate output is not rewritable. */
    private def rewritten(agg: Aggregate, e: MvEntry): Option[LogicalPlan] = {
      val groupNames = agg.groupingExpressions.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
      if (groupNames.isEmpty || !groupNames.forall(e.keys.contains))
        return None
      // roll the view up to the query's grouping
      val first = sum(col("cnt")).as("__cnt")
      val rest = e.sumCols.map(c => sum(col(s"sum_$c")).as(s"__sum_$c"))
      val rolled = e.view.read()
        .groupBy(groupNames.map(col): _*)
        .agg(first, rest: _*)
      val rolledPlan = rolled.queryExecution.analyzed
      val byName = rolledPlan.output.map(a => a.name -> a).toMap
      val projList: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference if groupNames.contains(a.name) =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val repl: Option[Expression] = ae.aggregateFunction match {
            case Count(Seq(Literal(_, _))) => Some(byName("__cnt"))
            case Sum(a: AttributeReference, _) if e.sumCols.contains(a.name) =>
              byName.get(s"__sum_${a.name}")
                .filter(_.dataType == al.dataType)
            case Average(a: AttributeReference, _) if e.sumCols.contains(a.name) =>
              byName.get(s"__sum_${a.name}").map(s =>
                Divide(Cast(s, DoubleType), Cast(byName("__cnt"), DoubleType)))
            case _ => None
          }
          repl match {
            case Some(r) => Alias(r, name)(exprId = al.exprId)
            case None => return None
          }
        case _ => return None
      }
      Some(Project(projList, rolledPlan))
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          scanFiles(agg.child)
            .flatMap(freshEntryFor)
            .flatMap(rewritten(agg, _))
            .getOrElse(agg)
      }
  }
}
