package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** OPTIMIZE / ZORDER-approx / targetFileSize compaction (SURVEY.md §4;
  * reference `DP/Step 1:224,297`, `DP/Step 2`).
  *
  * Z-ordering is approximated by `repartitionByRange(cols) +
  * sortWithinPartitions(cols)`: each output file then covers a narrow range
  * of the clustering keys, so parquet row-group min/max stats (and our
  * per-file pruning) skip files exactly the way the reference's ZORDER
  * demos show (`DP/Step 2:115-202` — 33/34 files pruned on a point
  * lookup). Interleaved (true Z-curve) ordering matters only for
  * multi-column box queries; range-cluster is the right first-order
  * approximation and is what Delta's own OPTIMIZE does for 1 column.
  */
object Maintenance {

  private val DefaultTargetFileBytes = 128L * 1024 * 1024

  /** Range-cluster `df` into `nFiles` output partitions. A single output
    * file needs no range partitioning — `coalesce(1) + sortWithinPartitions`
    * skips repartitionByRange's sampling pass AND the full-table shuffle
    * (coalesce is a narrow dependency); the produced file is identically
    * sorted. The multi-file path keeps the sampling+shuffle, which is the
    * correct (and unavoidable) plan once file count > 1. */
  private def clusterInto(df: org.apache.spark.sql.DataFrame,
      zorderBy: Seq[String], nFiles: Int): org.apache.spark.sql.DataFrame =
    if (zorderBy.isEmpty) df.coalesce(nFiles)
    else if (nFiles == 1)
      df.coalesce(1).sortWithinPartitions(zorderBy.map(col): _*)
    else df.repartitionByRange(nFiles, zorderBy.map(col): _*)
      .sortWithinPartitions(zorderBy.map(col): _*)

  def parseSize(s: String): Long = {
    val t = s.trim.toLowerCase
    if (t.endsWith("gb")) t.dropRight(2).trim.toLong * 1024 * 1024 * 1024
    else if (t.endsWith("mb")) t.dropRight(2).trim.toLong * 1024 * 1024
    else if (t.endsWith("kb")) t.dropRight(2).trim.toLong * 1024
    else t.toLong
  }

  /** OPTIMIZE [ZORDER BY (cols)]: rewrite the table into
    * ceil(bytes / targetFileSize) files, range-clustered by `zorderBy`.
    * Without explicit columns, a `graft.clusterBy` table property (set by
    * `CLUSTER BY` DDL — liquid-clustering surface) supplies the layout
    * key, so a bare OPTIMIZE re-clusters incrementally ingested data. */
  def optimize(t: GraftTable, zorderBy: Seq[String] = Nil): Commit = {
    val zorderByEff =
      if (zorderBy.nonEmpty) zorderBy
      else t.properties.get("graft.clusterBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val files = t.filesAt()
    if (files.isEmpty) return t.commit("OPTIMIZE", Nil, Nil, t.schemaAt())
    val totalBytes = files.map(f => Files.size(Paths.get(f))).sum
    val target = t.properties.get("graft.targetFileSize")
      .map(parseSize).getOrElse(DefaultTargetFileBytes)
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / target).toInt)

    val df = t.read()
    val clustered = clusterInto(df, zorderByEff, nFiles)

    val added = t.writeData(clustered)
    def rel(f: String) = Paths.get(t.path).toAbsolutePath
      .relativize(Paths.get(f).toAbsolutePath).toString
    val removed = files.map(rel)
    // the rewrite materialized any deletion vectors (read() applies them)
    t.commit("OPTIMIZE", added, removed, t.schemaAt(),
      Map("zOrderBy" -> zorderByEff.mkString(",")),
      removedDv = t.dvAt().map(rel),
      metrics = Map(
        "numFilesRemoved" -> files.size.toLong,
        "numFilesAdded" -> added.size.toLong,
        "bytesCompacted" -> totalBytes),
      fileStats = t.harvestStats(added))
  }

  /** Incremental OPTIMIZE: compact only files below
    * `smallFileFraction × targetFileSize` — what repeated small appends
    * leave behind — and leave well-sized files alone. A full-table
    * rewrite per OPTIMIZE is a non-starter at 100 TB; this is the
    * steady-state maintenance pass (Delta's OPTIMIZE compacts exactly
    * this way: only files under minFileSize are rewritten). Deletion
    * vectors are untouched — entries for rewritten files dangle
    * harmlessly (the rewrite materialized them), entries for skipped
    * files stay live; a full `optimize` clears them all. */
  def optimizeIncremental(t: GraftTable, zorderBy: Seq[String] = Nil,
      smallFileFraction: Double = 0.5): Commit = {
    val zorderByEff =
      if (zorderBy.nonEmpty) zorderBy
      else t.properties.get("graft.clusterBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val target = t.properties.get("graft.targetFileSize")
      .map(parseSize).getOrElse(DefaultTargetFileBytes)
    val small = t.filesAt()
      .filter(f => Files.size(Paths.get(f)) < (target * smallFileFraction).toLong)
    if (small.size < 2)
      return t.commit("OPTIMIZE", Nil, Nil, t.schemaAt(),
        Map("zOrderBy" -> zorderByEff.mkString(","), "incremental" -> "true"))
    val totalBytes = small.map(f => Files.size(Paths.get(f))).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / target).toInt)
    val df = t.readFiles(small)
    val clustered = clusterInto(df, zorderByEff, nFiles)
    val added = t.writeData(clustered)
    def rel(f: String) = Paths.get(t.path).toAbsolutePath
      .relativize(Paths.get(f).toAbsolutePath).toString
    t.commit("OPTIMIZE", added, small.map(rel), t.schemaAt(),
      Map("zOrderBy" -> zorderByEff.mkString(","), "incremental" -> "true"),
      metrics = Map(
        "numFilesRemoved" -> small.size.toLong,
        "numFilesAdded" -> added.size.toLong,
        "bytesCompacted" -> totalBytes),
      fileStats = t.harvestStats(added))
  }
}
