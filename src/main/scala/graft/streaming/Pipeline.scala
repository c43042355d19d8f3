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
  */
final class Pipeline(spark: SparkSession) {

  final case class Flow(
      name: String,
      deps: Seq[String],
      expectations: Seq[Expectations.Rule],
      body: Map[String, DataFrame] => DataFrame)

  final case class FlowEvent(
      flow: String, status: String, rows: Long, violations: Map[String, Long])

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
  def run(): Map[String, DataFrame] = {
    val done = mutable.LinkedHashMap[String, DataFrame]()
    val visiting = mutable.Set[String]()
    def visit(name: String): DataFrame = done.getOrElse(name, {
      require(visiting.add(name), s"dependency cycle at $name")
      val f = flows.getOrElse(name, sys.error(s"pipeline has no dataset '$name'"))
      f.deps.foreach(visit)
      val raw = f.body(done.toMap)
      val out = Expectations(raw, f.expectations)
      val violations: Map[String, Long] =
        if (f.expectations.isEmpty) Map.empty
        else {
          val aggs = f.expectations.map(r =>
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(
                org.apache.spark.sql.functions.not(
                  org.apache.spark.sql.functions.expr(r.predicate)), 1L).otherwise(0L))
              .as(r.name))
          val row = raw.agg(aggs.head, aggs.tail: _*).head()
          f.expectations.zipWithIndex.map { case (r, i) =>
            r.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
          }.toMap
        }
      val cached = out.persist()
      eventLog += FlowEvent(name, "COMPLETED", cached.count(), violations)
      visiting -= name
      done(name) = cached
      cached
    })
    flows.keys.foreach(visit)
    done.toMap
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
