package graft.perf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Lineage cut for iterative and multi-consumer frames.
  *
  * Spark cannot recompute a frame whose lineage was truncated by
  * `localCheckpoint`: the materialized blocks live only on the executors
  * that wrote them, so one lost executor fails every job that still needs
  * them. That is acceptable for a single-box gate run and a
  * restart-the-world hazard for a 100 TB iterative job on a cluster where
  * executor churn is routine. [[cut]] upgrades to a RELIABLE checkpoint
  * (cluster-FS write, survives any executor loss) whenever the session
  * has `SparkContext.setCheckpointDir` configured — the standard
  * production setting for iterative Spark workloads — and falls back to
  * the cheap local form otherwise, so callers encode "materialize here"
  * once and deployments choose the durability.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist around the checkpoint: an unpersisted reliable checkpoint
      // computes the plan TWICE — once for the eager count, once when the
      // checkpoint job re-runs the lineage to write the files (the
      // documented RDD.checkpoint pitfall). The cache makes the second
      // pass a block read; unpersist drops it once the files exist.
      df.persist(StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(eager = true)
      finally df.unpersist(blocking = false)
    } else df.localCheckpoint(eager = true)

  /** The cluster-FS directory backing a reliably-cut frame; None for
    * local cuts (block-backed, cleaned by the ContextCleaner). */
  private def checkpointDirOf(df: DataFrame): Option[String] =
    df.queryExecution.optimizedPlan.collectFirst {
      case l: LogicalRDD => l.rdd.getCheckpointFile
    }.flatten

  /** Cut for ITERATIVE loops: each call deletes the previous round's
    * reliable checkpoint once the new one is materialized. Without this
    * an N-round loop (connected components, k-means) leaks N full copies
    * of the frame to the cluster checkpoint dir — Spark only removes
    * reliable checkpoints under `spark.cleaner.referenceTracking.
    * cleanCheckpoints` (default false) and never on app exit. The LATEST
    * cut is never deleted (it backs the loop's result); the one
    * still-live checkpoint is bounded O(1) per loop, reclaimed with the
    * application's checkpoint dir. Not thread-safe: one Chain per loop.
    */
  final class Chain {
    private var prev: Option[(DataFrame, String)] = None

    def cut(df: DataFrame): DataFrame = {
      val out = Lineage.cut(df)
      prev.foreach { case (owner, dir) =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(owner.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      prev = checkpointDirOf(out).map((out, _))
      out
    }
  }
}
