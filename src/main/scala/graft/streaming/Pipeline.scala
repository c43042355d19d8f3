package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DLT-like declarative pipeline (`DP/Step 3`, `CDC/01`, `LOANS/02`):
  * named dataset definitions with dependencies and expectations, resolved
  * into a topological run order; per-flow events (rows, violation counts,
  * status) land in an event log the log-analysis queries can consume
  * (`LOANS/03-Log-Analysis.sql`).
  *
  * Each flow's body receives the already-materialized upstream datasets —
  * the `live.x` reference model. Materialization boundaries are explicit
  * (persist), so a 100 TB pipeline only recomputes each layer once.
  *
  * With `eventLogPath` set, run() also persists the events to a
  * queryable GraftTable in the DLT event_log shape — (timestamp,
  * event_type, details) with the flow_progress payload as a JSON
  * `details` column — so the reference's Log-Analysis queries run
  * against it via the `details:flow_progress...` path syntax.
  */
final class Pipeline(spark: SparkSession, eventLogPath: Option[String] = None) {

  final case class Flow(
      name: String,
      deps: Seq[String],
      expectations: Seq[Expectations.Rule],
      body: Map[String, DataFrame] => DataFrame)

  final case class FlowEvent(
      flow: String, status: String, rows: Long, violations: Map[String, Long],
      inputRows: Long = 0L, explain: String = "")

  private val flows = mutable.LinkedHashMap[String, Flow]()
  private val eventLog = mutable.ArrayBuffer[FlowEvent]()

  def table(name: String, deps: Seq[String] = Nil,
      expectations: Seq[Expectations.Rule] = Nil)
      (body: Map[String, DataFrame] => DataFrame): this.type = {
    flows(name) = Flow(name, deps, expectations, body)
    this
  }

  def events: Seq[FlowEvent] = eventLog.toSeq

  /** Topologically resolve and run every flow; returns materialized
    * datasets by name. */
  private val cachedFlows = mutable.Buffer[DataFrame]()

  def run(): Map[String, DataFrame] = {
    val done = mutable.LinkedHashMap[String, DataFrame]()
    val visiting = mutable.Set[String]()
    def visit(name: String): DataFrame = done.getOrElse(name, {
      require(visiting.add(name), s"dependency cycle at $name")
      val f = flows.getOrElse(name, sys.error(s"pipeline has no dataset '$name'"))
      f.deps.foreach(visit)
      val raw = f.body(done.toMap)
      val out = Expectations(raw, f.expectations)
      val (violations, inputRows): (Map[String, Long], Long) =
        if (f.expectations.isEmpty) (Map.empty, 0L)
        else {
          import org.apache.spark.sql.functions.{count, expr, lit, not, sum, when}
          val aggs = f.expectations.map(r =>
            sum(when(not(expr(r.predicate)), 1L).otherwise(0L)).as(r.name)) :+
            count(lit(1)).as("__in")
          val row = raw.agg(aggs.head, aggs.tail: _*).head()
          (f.expectations.zipWithIndex.map { case (r, i) =>
            r.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
          }.toMap, row.getLong(f.expectations.size))
        }
      val cached = out.persist()
      cachedFlows += cached
      // capture the flow's physical plan for the event log (the reference
      // pipeline logs the Spark plan per flow, LOANS/03-Log-Analysis
      // .sql:59-70 — the first thing a user reads when a flow is slow)
      val plan = cached.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      eventLog += FlowEvent(name, "COMPLETED", cached.count(), violations,
        inputRows, plan)
      visiting -= name
      done(name) = cached
      cached
    })
    flows.keys.foreach(visit)
    persistEventLog()
    done.toMap
  }

  /** Release the run's per-flow caches. `run()` persists each flow's
    * output so downstream flows read it once (the DAG-materialization
    * semantics), but Spark's CacheManager pins those plans until an
    * explicit unpersist — a service running many pipelines would
    * accumulate them. Call after the run's outputs are consumed;
    * un-released caches survive only for the Pipeline's lifetime by
    * design (flows are recomputed if read after release). */
  def release(): Unit = {
    cachedFlows.foreach(_.unpersist())
    cachedFlows.clear()
  }

  /** Write the run's events to the event-log table (DLT event_log shape:
    * timestamp, event_type, details-JSON). */
  private def persistEventLog(): Unit = eventLogPath.foreach { path =>
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = eventLog.toSeq.flatMap { e =>
      Seq((now, "flow_definition", Pipeline.definitionJson(e)),
        (now, "flow_progress", Pipeline.detailsJson(e)))
    }
    val df = rows.toDF("timestamp", "event_type", "details")
    val t =
      if (graft.tables.GraftTable.exists(path)) graft.tables.GraftTable.load(spark, path)
      else graft.tables.GraftTable.create(spark, path, df.schema)
    t.append(df, "PIPELINE EVENTS")
  }

  /** Event log as a DataFrame (flow_progress analytics shape). */
  def eventsDF: DataFrame = {
    import spark.implicits._
    eventLog.toSeq.map(e =>
      (e.flow, e.status, e.rows,
        e.violations.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")))
      .toDF("flow", "status", "rows", "violations")
  }
}

object Pipeline {
  /** DLT-style flow_progress details payload
    * (`LOANS/03-Log-Analysis.sql:77-104` reads exactly these paths). */
  private[streaming] def detailsJson(e: Pipeline#FlowEvent): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val fp = root.putObject("flow_progress")
    fp.put("flow_name", e.flow)
    fp.put("status", e.status)
    fp.putObject("metrics").put("num_output_rows", e.rows)
    if (e.violations.nonEmpty) {
      val exps = fp.putObject("data_quality").putArray("expectations")
      e.violations.toSeq.sortBy(_._1).foreach { case (name, failed) =>
        val x = exps.addObject()
        x.put("name", name)
        x.put("failed_records", failed)
        x.put("passed_records", e.inputRows - failed)
      }
    }
    m.writeValueAsString(root)
  }

  /** flow_definition payload: the flow's physical plan, as the reference
    * logs per DLT flow (`LOANS/03-Log-Analysis.sql:59-70`). */
  private[streaming] def definitionJson(e: Pipeline#FlowEvent): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val fd = root.putObject("flow_definition")
    fd.put("flow_name", e.flow)
    fd.put("explain", e.explain)
    m.writeValueAsString(root)
  }
}
