package graft.services

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.GraftTable

/** Run/process logging service (`HF/deltalogger.py:167-446`): a versioned
  * table of process runs with status, timing, metadata and metric maps —
  * operational metadata as data, queryable like any table.
  */
final class DeltaLogger(spark: SparkSession, path: String,
    processName: String) {

  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("process_name", StringType),
    StructField("status", StringType),
    StructField("start_ts", TimestampType),
    StructField("end_ts", TimestampType),
    StructField("duration_ms", LongType),
    StructField("run_metadata", MapType(StringType, StringType)),
    StructField("run_metrics", MapType(StringType, DoubleType))))

  private val table: GraftTable =
    if (GraftTable.exists(path)) GraftTable.load(spark, path)
    else GraftTable.create(spark, path, schema,
      Map("graft.identity.column" -> "run_id"))

  private final case class ActiveRun(
      startedMs: Long, metadata: mutable.Map[String, String],
      metrics: mutable.Map[String, Double])

  private var active: Option[ActiveRun] = None

  def startRun(metadata: Map[String, String] = Map.empty): Unit = {
    require(active.isEmpty, "a run is already active")
    active = Some(ActiveRun(System.currentTimeMillis(),
      mutable.Map(metadata.toSeq: _*), mutable.Map.empty))
  }

  def logMetric(name: String, value: Double): Unit =
    active.foreach(_.metrics(name) = value)

  def setMeta(key: String, value: String): Unit =
    active.foreach(_.metadata(key) = value)

  def endRun(status: String = "SUCCESS"): Unit = {
    val run = active.getOrElse(sys.error("no active run"))
    val end = System.currentTimeMillis()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val row = Seq((processName, status,
      new java.sql.Timestamp(run.startedMs), new java.sql.Timestamp(end),
      end - run.startedMs, run.metadata.toMap, run.metrics.toMap))
      .toDF("process_name", "status", "start_ts", "end_ts", "duration_ms",
        "run_metadata", "run_metrics")
    table.append(row, "LOG RUN")
    active = None
  }

  /** fail-status convenience mirroring the reference's logger states. */
  def failRun(error: String): Unit = {
    setMeta("error", error)
    endRun("FAILED")
  }

  def runs: DataFrame = table.read()
}
