package graft.services

import org.apache.spark.sql.DataFrame

/** Parallel custom-named file export (`DP/Advanced Notebooks/Parallel
  * Custom Named File Exports`): write a manifest of (srcPath, destPath)
  * moves, then execute them executor-side with `foreachPartition` + the
  * Hadoop FS API — the driver never touches file bytes, so a million-file
  * fan-out scales with the cluster, not the driver.
  */
object FileExport {

  /** Execute (src, dest) copies partition-parallel; returns count done. */
  def copyAll(manifest: DataFrame, srcCol: String = "src",
      destCol: String = "dest"): Long = {
    val spark = manifest.sparkSession
    // Hadoop Configuration isn't serializable: ship the kv pairs instead
    val hconf = spark.sessionState.newHadoopConf()
    val confKv: Seq[(String, String)] = {
      import scala.collection.JavaConverters._
      hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    }
    val done = spark.sparkContext.longAccumulator("files_exported")
    manifest.select(srcCol, destCol).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        rows.foreach { r =>
          val src = new org.apache.hadoop.fs.Path(r.getString(0))
          val dst = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = dst.getFileSystem(conf)
          fs.mkdirs(dst.getParent)
          org.apache.hadoop.fs.FileUtil.copy(
            src.getFileSystem(conf), src, fs, dst, false, true, conf)
          done.add(1)
        }
    }
    done.value
  }
}
