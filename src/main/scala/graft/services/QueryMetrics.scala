package graft.services

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch-query observability: a QueryExecutionListener capturing per-query
  * duration, touched tables, and physical-plan shape into a queryable log
  * (the reference's query-history tables / spill-detection guidance,
  * `OBS/dbsql-logging`, `DP/Step 14:13-17`). Feed the records to
  * WorkloadOptimizer as its query history.
  */
object QueryMetrics {

  final case class QueryRecord(
      funcName: String, durationMs: Long, tables: Seq[String],
      hasShuffle: Boolean, hasBroadcast: Boolean, failed: Boolean,
      usage: Seq[graft.optimizer.WorkloadOptimizer.ColumnUsage])

  final class Collector extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[QueryRecord]()
    def records: Seq[QueryRecord] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()

    private def record(funcName: String, qe: QueryExecution,
        durationNs: Long, failed: Boolean): Unit = {
      val plan = qe.executedPlan.toString
      val tables = qe.analyzed.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => r.alias
      }.distinct
      // extract column usage eagerly — retaining the plan would pin memory
      val usage = graft.optimizer.WorkloadOptimizer
        .usageFromPlan(qe.analyzed, tables.toSet, durationNs / 1000000)
      buf.add(QueryRecord(funcName, durationNs / 1000000, tables,
        plan.contains("Exchange"), plan.contains("Broadcast"), failed, usage))
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(funcName, qe, durationNs, failed = false)
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      record(funcName, qe, 0L, failed = true)

    /** Accumulated column usage across everything observed — feed this to
      * `WorkloadOptimizer.buildStrategyFromUsage` to close the
      * monitor→recommend loop. */
    def workloadUsage: Seq[graft.optimizer.WorkloadOptimizer.ColumnUsage] =
      graft.optimizer.WorkloadOptimizer.mergeUsage(records.flatMap(_.usage))
  }

  /** Install a collector on the session; caller keeps the handle. */
  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  def toDF(spark: SparkSession, c: Collector): DataFrame = {
    import spark.implicits._
    c.records.map(r => (r.funcName, r.durationMs,
      r.tables.sorted.mkString(","), r.hasShuffle, r.hasBroadcast, r.failed))
      .toDF("func", "duration_ms", "tables", "has_shuffle", "has_broadcast", "failed")
  }
}
