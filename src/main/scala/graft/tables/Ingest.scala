package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY INTO: idempotent incremental file loading (`DP/Step 1:125-147`).
  *
  * Idempotency comes from a per-table ingest ledger (`_log/copied_files.txt`)
  * of already-loaded source files; re-running the same COPY INTO is a no-op
  * unless `force = true` (`COPY_OPTIONS('force'='true')`). The ledger is the
  * Spark-side equivalent of the reference's file-tracking — at scale it
  * stays driver-small because it holds file *names*, not data.
  */
object Ingest {

  /** Load files matching `pattern` under `sourceDir` into `t`.
    *
    * @param transform inline cast/projection subquery equivalent
    *                  (`SELECT id::bigint ... FROM '/path'`)
    */
  def copyInto(
      t: GraftTable,
      sourceDir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      pattern: String = "*",
      transform: DataFrame => DataFrame = identity,
      force: Boolean = false): Long = {
    val ledgerPath = Paths.get(t.path, "_log", "copied_files.txt")
    val already: Set[String] =
      if (force || !Files.exists(ledgerPath)) Set.empty
      else Files.readAllLines(ledgerPath).asScala.toSet

    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$pattern")
    val dir = Paths.get(sourceDir)
    val candidates =
      if (Files.isRegularFile(dir)) Seq(dir)
      else GraftTable.walkDir(dir)
        .filter(Files.isRegularFile(_))
        .filter(p => matcher.matches(p.getFileName))
        .sortBy(_.toString)
    val fresh = candidates.map(_.toAbsolutePath.toString).filterNot(already)
    if (fresh.isEmpty) return 0L

    // tolerate TIMESTAMP(NANOS) parquet (read as long; callers convert)
    t.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = t.spark.read.options(options)
    val raw = format match {
      case "parquet" => reader.parquet(fresh: _*)
      case "json" => reader.json(fresh: _*)
      case "csv" => reader.csv(fresh: _*)
      case other => reader.format(other).load(fresh: _*)
    }
    // row count comes from the written files' footers (harvested during
    // commit anyway) — no separate count() pass over the source
    val c = t.append(transform(raw), "COPY INTO",
      Map("sourceDir" -> sourceDir, "pattern" -> pattern))
    val n = c.metrics.getOrElse("numOutputRows", 0L)

    // update ledger atomically (write-then-move)
    val all = (already ++ fresh).toSeq.sorted
    val tmp = Files.createTempFile(ledgerPath.getParent, ".ledger", ".tmp")
    Files.write(tmp, all.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, ledgerPath, StandardCopyOption.REPLACE_EXISTING)
    n
  }
}
