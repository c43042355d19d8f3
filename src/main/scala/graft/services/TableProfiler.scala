package graft.services

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Schema-wide table profiler — the reference's data-profiling pillar
  * (`40-observability/data-profiling/01-create-data-profile.py`: sweep
  * every table in a schema with DESCRIBE DETAIL, persist the stats,
  * summarize the findings): discover the tables under a warehouse root,
  * profile each from COMMIT-LOG METADATA ONLY (file list, footer row
  * counts, partition spec, version — zero data-file reads; parquet
  * row counts come from footers), and flag the actionable findings the
  * reference's summary queries look for — small-file fragmentation
  * (OPTIMIZE candidates) and never-clustered large tables.
  *
  * Scale: driver traffic is table-cardinality (one row per table); the
  * per-table work is directory listing + log parse, both already cached
  * by [[GraftTable]]'s commit-log cache. A 10⁵-table metastore sweeps in
  * table-count time, not data-size time.
  *
  * The DR helper mirrors the reference's UC-managed-location DDL
  * generator (same notebook, final section): re-create any profiled
  * table as an external table over its current location.
  */
object TableProfiler {

  /** Table directories under `root` (depth 1), in name order — a dir is a
    * table iff it has a commit log. Loan-pattern close on the listing
    * stream: `Files.list(...).iterator()` without a close leaks the
    * directory fd until GC (the trap `GraftTable.listDir`'s Scaladoc
    * documents), and a metastore-scale sweep calls this per root. */
  def discover(root: String): Seq[(String, String)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Nil
    val s = Files.list(r)
    val entries =
      try s.iterator().asScala.toList
      finally s.close()
    entries
      .filter(p => Files.isDirectory(p) && GraftTable.exists(p.toString))
      .map(p => (p.getFileName.toString, p.toString))
      .sortBy(_._1)
  }

  /** One DESCRIBE-DETAIL row per (name, path): row/file counts, bytes,
    * partition spec, version, property count. */
  def profile(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    tables.map { case (name, path) =>
      val t = GraftTable.load(spark, path)
      val files = t.filesAt() // absolute paths
      val bytes = files.map(f => Files.size(Paths.get(f))).sum
      val nRows = t.read().count() // parquet footer counts — no data read
      (name, nRows, files.size.toLong, bytes,
        if (files.isEmpty) 0L else bytes / files.size,
        t.partitionColumns.mkString(","), t.currentVersion,
        t.properties.size.toLong)
    }.toDF("table", "n_rows", "n_files", "total_bytes", "avg_file_bytes",
      "partition_columns", "version", "n_properties")
  }

  /** Sweep = discover + profile. */
  def profileDir(spark: SparkSession, root: String): DataFrame =
    profile(spark, discover(root))

  /** The reference summary's actionable flags: fragmented (many files,
    * small average — run OPTIMIZE) and unpartitioned-large (consider
    * clustering). Thresholds are caller policy, not magic. */
  def summarize(profile: DataFrame, smallFileBytes: Long,
      largeTableRows: Long): DataFrame =
    profile.select(col("table"), col("n_rows"), col("n_files"),
      col("avg_file_bytes"),
      (col("n_files") > 1 && col("avg_file_bytes") < smallFileBytes)
        .as("needs_compaction"),
      (col("n_rows") >= largeTableRows && col("partition_columns") === "")
        .as("consider_clustering"))

  /** Release manifest: one row per LIVE data file — relative path, bytes,
    * parquet row count (footer read, no data scan), md5 of the file bytes
    * — the reproducibility artifact a dataset release ships so a consumer
    * can verify their copy file-by-file (and a DR restore can detect
    * partial copies). Bounded by file count; checksums stream the file
    * once each. */
  def manifest(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.load(spark, path)
    val base = Paths.get(path)
    val files = t.filesAt() // absolute
    val rows = graft.tables.FileStats.harvestWithRows(spark, files)
    files.map { f =>
      val p = Paths.get(f)
      (base.relativize(p).toString, Files.size(p),
        rows.get(f).map(_._1).getOrElse(-1L), md5Stream(p))
    }.sortBy(_._1).toDF("file", "bytes", "n_rows", "md5")
  }

  /** MD5 of a file through a fixed 64 KiB buffer — constant heap per file
    * regardless of file size (a multi-GB data file must not be
    * `readAllBytes`'d into driver heap just to checksum it). */
  private def md5Stream(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** DR helper: external-table DDL over the table's data location
    * (schema from the live version, Spark DDL rendering; recursive
    * lookup because commits write under per-commit subdirs). CAVEAT —
    * like any raw-parquet bootstrap it reads every data file present, so
    * it is snapshot-accurate only when no REMOVED files linger (fresh
    * table, or post-VACUUM(0)); the commit log, not this DDL, is the
    * source of truth for a versioned read. */
  def externalDdl(spark: SparkSession, name: String, path: String): String = {
    val t = GraftTable.load(spark, path)
    // SQL-escape the interpolated path: a quote in a filesystem path must
    // not break (or inject into) the emitted DDL.
    val escaped = s"$path/data".replace("'", "''")
    s"CREATE TABLE $name (${t.schemaAt().toDDL}) USING PARQUET " +
      s"OPTIONS (path '$escaped', recursiveFileLookup 'true')"
  }
}
