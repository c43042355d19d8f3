package graft.perf

import org.apache.spark.sql.DataFrame

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
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
