package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.tables.{GraftTable, MergeOps}

/** Structured-streaming building blocks:
  *  - micro-batch MERGE sink (`foreachBatch` pattern, `DP/Step 5:208-296`)
  *  - streaming→GraftTable append sink with availableNow semantics
  *  - StreamingQueryListener metrics capture (`OBS/stream-monitoring`)
  */
object StreamOps {

  /** Run a streaming DataFrame to completion (availableNow) through a
    * foreachBatch MERGE into a GraftTable: the bronze→silver exactly-once
    * upsert. Dedup-within-batch is the caller's stage (ROW_NUMBER idiom). */
  def mergeStream(
      stream: DataFrame,
      target: GraftTable,
      condition: String,
      checkpoint: String,
      prepare: DataFrame => DataFrame = identity): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val src = prepare(batch)
        MergeOps.mergeInto(
          target, src, condition,
          matched = Seq(MergeOps.WhenMatched(None, MergeOps.UpdateAll)),
          notMatched = Seq(MergeOps.WhenNotMatched(None, MergeOps.InsertAll)))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drive a streaming aggregation to completion (availableNow, complete
    * output mode) through foreachBatch overwriting a GraftTable — the
    * scale-shaped replacement for a driver-side memory sink: each
    * micro-batch's full result is written distributed and the caller
    * reads the table back, so nothing buffers on the driver. */
  def completeToTable(agg: DataFrame, target: GraftTable, checkpoint: String): GraftTable = {
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        target.overwrite(batch, "STREAMING COMPLETE")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    target
  }

  /** Drive an update-mode stream (stateful transforms, unwindowed aggs)
    * to completion through a foreachBatch keyed MERGE: each micro-batch
    * carries only the keys whose state changed, and the upsert folds them
    * into the table — refresh cost ∝ changed keys, never table size. */
  def updateToTable(updates: DataFrame, target: GraftTable,
      keyCols: Seq[String], checkpoint: String): GraftTable = {
    val cond = keyCols.map(k => s"target.$k = source.$k").mkString(" AND ")
    val q = updates.writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MergeOps.mergeInto(
          target, batch, cond,
          matched = Seq(MergeOps.WhenMatched(None, MergeOps.UpdateAll)),
          notMatched = Seq(MergeOps.WhenNotMatched(None, MergeOps.InsertAll)))
        ()
      }
      .start()
    q.awaitTermination()
    target
  }

  /** Append-only streaming sink into a GraftTable. */
  def appendStream(stream: DataFrame, target: GraftTable, checkpoint: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        target.append(batch, "STREAMING UPDATE")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Stream a GraftTable as a source (`readStream.table(t)`,
    * `DP/Step 5:182-189`): a file stream over the table's data dirs — each
    * append commits new immutable files, which the file source picks up
    * exactly once per checkpoint. OPTIMIZE/merge rewrites re-emit rewritten
    * rows (the `ignoreChanges` caveat the reference documents), and
    * deletion-vector deletes are not retracted from the stream (file
    * contents are unchanged); route through `changesStream` when
    * row-level change semantics matter. */
  def tableStream(t: GraftTable): DataFrame =
    t.spark.readStream.schema(t.schemaAt())
      .option("pathGlobFilter", "*.parquet")
      // partition values are in the files (GraftTable __part_ layout);
      // recursiveFileLookup disables Hive partition inference on the dirs
      .option("recursiveFileLookup", "true")
      .parquet(java.nio.file.Paths.get(t.path, "data").toString + "/*")

  /** Stream over a table's change feed (`readChangeFeed` source shape,
    * `DP/Advanced CDC:339-345`): a file stream over the `_changes` dirs,
    * exactly-once via the caller's checkpoint. */
  def changesStream(t: GraftTable): DataFrame = {
    val schema = t.changes().schema
    t.spark.readStream.schema(schema)
      .parquet(java.nio.file.Paths.get(t.path, "_changes").toString + "/v*")
  }

  /** Multiplex one stream into N tables by a routing column
    * (`Multi-plexing with Autoloader` controller pattern): each route is
    * its own filtered foreachBatch append with its own checkpoint, and
    * all routes run CONCURRENTLY — start every query, then await each.
    * Serial route draining would make multiplex latency the SUM of the
    * routes, which at a 100-topic fan-out is the difference between one
    * trigger interval and a hundred; routes write disjoint tables and
    * checkpoints, so they never contend on commit state. */
  def multiplex(stream: DataFrame, routeCol: String,
      routes: Map[String, GraftTable], checkpointBase: String): Unit = {
    import org.apache.spark.sql.functions.col
    val started = routes.toSeq.map { case (value, target) =>
      stream.filter(col(routeCol) === value).writeStream
        .option("checkpointLocation", s"$checkpointBase/$value")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          target.append(batch, "STREAMING UPDATE")
          ()
        }
        .start()
    }
    // a failed route must not leak the others: awaitTermination throws on
    // the first failure, and the not-yet-awaited routes would keep writing
    // in the background while the caller handles the error — stop every
    // still-active query before propagating
    try started.foreach(_.awaitTermination())
    finally started.foreach(q => if (q.isActive) q.stop())
  }

  /** Captured per-batch progress (the reference dumps these JSON events to
    * a table and queries rows/s — `OBS/stream-monitoring:134-211`). */
  final case class BatchProgress(
      queryName: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      batchDurationMs: Long)

  /** Listener collecting progress events for later SQL analysis. */
  final class ProgressCollector extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchProgress]()
    def progresses: Seq[BatchProgress] = buf.iterator().asScala.toSeq

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      buf.add(BatchProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        p.inputRowsPerSecond, p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)))
    }
  }

  def progressDF(spark: SparkSession, c: ProgressCollector): DataFrame = {
    import spark.implicits._
    c.progresses.toDF()
  }
}
