package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.JavaConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, LongType, StringType, TimestampType, IntegerType}

/** One commit in a table's log. Mirrors the metadata surface the reference
  * relies on: `DESCRIBE HISTORY` columns + `operationParameters.predicate`
  * (mined by the delta-optimizer at `OPT:1345-1423`).
  */
final case class Commit(
    version: Long,
    timestampMs: Long,
    operation: String,
    operationParameters: Map[String, String],
    addedFiles: Seq[String],
    removedFiles: Seq[String],
    schemaJson: String,
    properties: Map[String, String],
    identityHighWatermark: Long,
    metrics: Map[String, Long],
    fileStats: Map[String, Map[String, (String, String)]] = Map.empty,
    // deletion-vector sidecar files (merge-on-read deletes), same
    // add/remove delta semantics as data files
    addedDvFiles: Seq[String] = Nil,
    removedDvFiles: Seq[String] = Nil)

/** Versioned Parquet table ("tacklelog"): a data directory plus a JSON
  * commit log, giving the Delta-style semantics the reference leans on —
  * snapshot isolation, time travel, RESTORE, DESCRIBE HISTORY, CDF,
  * OPTIMIZE — over plain Spark (no Delta jars in this environment; see
  * SURVEY.md §7).
  *
  * Layout:
  * {{{
  *   <path>/_log/v00000000000000000042.json   // one commit per version
  *   <path>/data/<commit-uuid>/part-*.parquet // immutable data files
  *   <path>/_changes/v42/part-*.parquet       // optional change feed
  * }}}
  *
  * Scale design: the log stores *file lists*, so a snapshot read is
  * `spark.read.parquet(files: _*)` — pruning/pushdown work unchanged, and
  * DML rewrites only the files that contain matched rows (see MergeOps).
  * Commits are atomic single-file renames; concurrent writers race on the
  * version filename and the loser retries (`Concurrency.retry`), matching
  * the reference's retry-merge helper (`HF/deltahelpers.py:132-172`).
  */
final class GraftTable private (val spark: SparkSession, val path: String) {
  import GraftTable._

  private def logDir: Path = Paths.get(path, "_log")
  private def dataDir: Path = Paths.get(path, "data")

  // ---- log access --------------------------------------------------------

  /** Parsed commit log. The log is append-only, so parses are cached
    * session-wide (keyed by table path, shared across GraftTable
    * instances) and extended incrementally: a call re-lists the directory
    * (cheap) but reads/parses only commit files it has not seen. Cold
    * start bootstraps from the newest checkpoint file (written every
    * `checkpointInterval` commits) plus the tail — O(1) file reads per
    * operation after warm-up instead of O(versions), O(tail) on a fresh
    * JVM instead of O(versions). */
  def commits: Seq[Commit] = {
    if (!Files.isDirectory(logDir)) return Nil
    val entries = listDir(logDir).map(_.getFileName.toString)
    val names = entries.filter(_.matches("v\\d+\\.json")).sorted.toVector
    val cached = logCache.get(path)
    if (cached != null && cached._1 == names) return cached._2
    val parsed: Vector[Commit] =
      if (cached != null && names.startsWith(cached._1))
        cached._2 ++ names.drop(cached._1.size).map(readCommitFile)
      else {
        // fresh (or diverged) view: start from the newest checkpoint ≤ tip
        val ckpts = entries.filter(_.matches("checkpoint-v\\d+\\.json")).sorted
        val base: Vector[Commit] = ckpts.lastOption.map { c =>
          logFileReads.incrementAndGet()
          parseCommitList(new String(Files.readAllBytes(logDir.resolve(c)), "UTF-8")).toVector
        }.getOrElse(Vector.empty)
        val have = base.map(c => f"v${c.version}%020d.json").toSet
        base ++ names.filterNot(have).map(readCommitFile)
      }
    logCache.put(path, (names, parsed))
    parsed
  }

  private def readCommitFile(name: String): Commit = {
    logFileReads.incrementAndGet()
    parseCommit(new String(Files.readAllBytes(logDir.resolve(name)), "UTF-8"))
  }

  def currentVersion: Long = commits.lastOption.map(_.version).getOrElse(-1L)

  def commitAt(version: Long): Commit =
    commits.find(_.version == version).getOrElse(
      throw new IllegalArgumentException(s"$path has no version $version"))

  /** Version whose snapshot was current at `tsMs` (Delta's TIMESTAMP AS
    * OF semantics: the latest commit at-or-before the timestamp; a
    * timestamp after the last commit resolves to the latest version; one
    * before the first commit is an error, matching Delta's
    * timestampEarlierThanTableFirstCommit). */
  def versionAtTimestamp(tsMs: Long): Long = {
    val cs = commits
    require(cs.nonEmpty, s"$path has no commits")
    // clock skew between racing writers can locally reverse raw stamps;
    // monotonize with a running max (Delta's timestamp adjustment) so
    // the at-or-before search is well-defined
    val eff = cs.scanLeft(Long.MinValue)((m, c) => math.max(m, c.timestampMs)).drop(1)
    val idx = eff.lastIndexWhere(_ <= tsMs)
    if (idx < 0) throw new IllegalArgumentException(
      s"timestamp $tsMs predates the first commit of $path " +
        s"(${cs.head.timestampMs}); earliest available version is ${cs.head.version}")
    cs(idx).version
  }

  /** TIMESTAMP AS OF read: snapshot current at `tsMs`. */
  def readAsOfTimestamp(tsMs: Long): DataFrame = read(versionAtTimestamp(tsMs))

  /** Live data files (absolute paths) at a version (default: latest). */
  def filesAt(version: Long = Long.MaxValue): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    commits.takeWhile(_.version <= version).foreach { c =>
      c.removedFiles.foreach(live -= _)
      c.addedFiles.foreach(live += _)
    }
    live.toSeq.map(f => Paths.get(path, f).toString)
  }

  /** Live deletion-vector files (absolute paths) at a version. */
  def dvAt(version: Long = Long.MaxValue): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    commits.takeWhile(_.version <= version).foreach { c =>
      c.removedDvFiles.foreach(live -= _)
      c.addedDvFiles.foreach(live += _)
    }
    live.toSeq.map(f => Paths.get(path, f).toString)
  }

  /** Merge-on-read deletes enabled (`graft.deletionVectors` property):
    * DELETE writes a (file, row position) sidecar instead of rewriting
    * data files; reads anti-join it away. */
  def dvEnabled: Boolean =
    properties.getOrElse("graft.deletionVectors", "false") == "true"

  def schemaAt(version: Long = Long.MaxValue): StructType = {
    val cs = commits.takeWhile(_.version <= version)
    require(cs.nonEmpty, s"$path has no commits <= $version")
    DataType.fromJson(cs.last.schemaJson)
  }

  def properties: Map[String, String] =
    commits.lastOption.map(_.properties).getOrElse(Map.empty)

  def identityHighWatermark: Long =
    commits.lastOption.map(_.identityHighWatermark).getOrElse(0L)

  // ---- reads -------------------------------------------------------------

  /** Partition columns (Hive-style layout) configured for this table. */
  def partitionColumns: Seq[String] =
    properties.get("graft.partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** Read a specific set of this table's data files. Partition values are
    * stored in the files themselves (writeData partitions the directory
    * layout by a `__part_` *copy* of each partition column), so no Hive
    * partition inference is needed — inference breaks across multiple
    * commit dirs (CONFLICTING_DIRECTORY_STRUCTURES) and would resolve the
    * columns to null under a raw `spark.read.parquet(files)`. Every
    * internal reader (DML rewrites, CDF re-reads, streams) goes through
    * here; recursiveFileLookup disables inference on the `__part_k=v`
    * segments. */
  private[graft] def readFiles(files: Seq[String], readSchema: StructType = null): DataFrame =
    readFilesWithPos(files, readSchema).drop(DvFileCol, DvPosCol)

  /** As readFiles, but keeps the (__dv_file, __dv_pos) provenance columns
    * — the delete path records them into deletion vectors. Live DVs (at
    * the latest version) are already anti-joined away, so callers never
    * see deleted rows. */
  private[graft] def readFilesWithPos(files: Seq[String],
      readSchema: StructType = null, dvVersion: Long = Long.MaxValue): DataFrame = {
    val s = Option(readSchema).getOrElse(schemaAt())
    if (files.isEmpty) {
      val withPos = s.add(DvFileCol, StringType).add(DvPosCol, LongType)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], withPos)
    }
    def withPos(df: DataFrame): DataFrame = df
      .withColumn(DvFileCol, col("_metadata.file_path"))
      .withColumn(DvPosCol, col("_metadata.row_index"))
    // Legacy-layout detection: files written before the __part_ scheme use
    // bare Hive `k=v` segments and do NOT store the partition column in
    // the parquet data — they need per-write-root partition inference
    // (inference across roots throws CONFLICTING_DIRECTORY_STRUCTURES,
    // which is why the modern layout stores column copies instead).
    val parts = partitionColumns
    // Only inspect segments BELOW the table root: a `k=v` directory above
    // the table (e.g. the table living at /mnt/date=2020/tbl with a
    // partition column `date`) must not flip modern files to the legacy
    // branch, which would root basePath inference outside the table.
    val tableDepth = Paths.get(path).toAbsolutePath.normalize.getNameCount
    def legacyKeyIdx(abs: String): Int = {
      // normalize like tableDepth above: a '.'/'..' segment in the file
      // path would otherwise shift name indices relative to the table
      // root and misclassify files as legacy/modern
      val p = Paths.get(abs).toAbsolutePath.normalize
      (tableDepth until p.getNameCount).indexWhere { i =>
        val seg = p.getName(i).toString
        val j = seg.indexOf('=')
        j > 0 && !seg.startsWith("__part_") && parts.contains(seg.substring(0, j))
      } match {
        case -1 => -1
        case k  => k + tableDepth
      }
    }
    val (legacy, modern) =
      if (parts.isEmpty) (Nil, files) else files.partition(legacyKeyIdx(_) >= 0)
    val modernDf: Option[DataFrame] =
      if (modern.isEmpty) None
      else Some(withPos(
        spark.read.schema(s).option("recursiveFileLookup", "true").parquet(modern: _*)))
    val legacyDfs: Seq[DataFrame] = legacy.groupBy { abs =>
      // same normalization as legacyKeyIdx — the index is positional
      val p = Paths.get(abs).toAbsolutePath.normalize
      p.getRoot.resolve(p.subpath(0, legacyKeyIdx(abs))).toString
    }.toSeq.map { case (root, fs) =>
      withPos(spark.read.schema(s).option("basePath", root).parquet(fs: _*))
        .select((s.fieldNames.toSeq :+ DvFileCol :+ DvPosCol).map(col): _*)
    }
    val df = (modernDf.toSeq ++ legacyDfs).reduce(_ unionByName _)
    val dv = dvAt(dvVersion)
    if (dv.isEmpty) df
    else df.join(spark.read.parquet(dv: _*), Seq(DvFileCol, DvPosCol), "left_anti")
  }

  /** Snapshot read (optionally `VERSION AS OF`). */
  def read(versionAsOf: Long = Long.MaxValue): DataFrame =
    readFilesWithPos(filesAt(versionAsOf), schemaAt(versionAsOf), versionAsOf)
      .drop(DvFileCol, DvPosCol)

  /** DESCRIBE HISTORY equivalent (`DP/Step 1:235-239`). */
  def history: DataFrame = {
    import spark.implicits._
    commits.reverse.map { c =>
      (c.version, new java.sql.Timestamp(c.timestampMs), c.operation,
        c.operationParameters.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(";"),
        c.addedFiles.size.toLong, c.removedFiles.size.toLong,
        c.metrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(";"))
    }.toDF("version", "timestamp", "operation", "operationParameters",
      "numAddedFiles", "numRemovedFiles", "operationMetrics")
  }

  /** Change feed read: rows written by CDF-enabled commits from `fromVersion`
    * on, each tagged `_change_type` / `_commit_version`
    * (`table_changes(t, v)` in the reference, `DP/Advanced CDC:271,395`). */
  def changes(fromVersion: Long = 0L): DataFrame = {
    val dirs = commits.filter(_.version >= fromVersion)
      .map(c => Paths.get(path, "_changes", s"v${c.version}"))
      .filter(Files.isDirectory(_))
      .map(_.toString)
    if (dirs.isEmpty) {
      val schema = schemaAt()
        .add("_change_type", StringType).add("_commit_version", LongType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else spark.read.parquet(dirs: _*)
  }

  // ---- writes ------------------------------------------------------------

  /** Footer stats for freshly written table-relative files. */
  private[tables] def harvestStats(relFiles: Seq[String]): Map[String, Map[String, (String, String)]] =
    harvestStatsAndRows(relFiles)._1

  /** Footer stats plus total row count (one footer read per file). */
  private[tables] def harvestStatsAndRows(
      relFiles: Seq[String]): (Map[String, Map[String, (String, String)]], Long) = {
    val abs = relFiles.map(f => Paths.get(path, f).toString)
    val h = FileStats.harvestWithRows(spark, abs)
    val stats = relFiles.zip(abs)
      .map { case (rel, a) => rel -> h.get(a).map(_._2).getOrElse(Map.empty) }
      .filter(_._2.nonEmpty).toMap
    (stats, h.values.map(_._1).sum)
  }

  /** Per-file stats of the live files at a version (rel path → col →
    * (min,max)). The tip-version map is cached per table path: folding
    * every commit's stats on each `readWhere` is fine at 10³ files but
    * measurable at 10⁶, and the fold only changes when a commit lands
    * (cache key = current version, so any write invalidates naturally).
    * Historical versions are rare reads and compute fresh. */
  def statsAt(version: Long = Long.MaxValue): Map[String, Map[String, (String, String)]] = {
    val tip = currentVersion
    val v = math.min(version, tip)
    val cached = GraftTable.statsCache.get(path)
    if (cached != null && cached._1 == v) return cached._2
    GraftTable.statsMaterializations.incrementAndGet()
    val m = commits.takeWhile(_.version <= v)
      .foldLeft(Map.empty[String, Map[String, (String, String)]])(_ ++ _.fileStats)
    if (v == tip) GraftTable.statsCache.put(path, (v, m))
    m
  }

  /** Stats-pruned file list for a conjunctive predicate: only files whose
    * min/max ranges can match. Falls back to all files on unknown shapes. */
  def pruneFiles(predicateSql: String): (Seq[String], Int) = {
    val pred =
      try spark.sessionState.sqlParser.parseExpression(predicateSql)
      catch { case NonFatal(_) => val all = filesAt(); return (all, all.size) }
    pruneFilesByExpr(pred)
  }

  /** As `pruneFiles`, over an already-built predicate expression. */
  private[graft] def pruneFilesByExpr(
      pred: org.apache.spark.sql.catalyst.expressions.Expression): (Seq[String], Int) = {
    val all = filesAt()
    val stats = statsAt()
    val schema = schemaAt()
    val base = Paths.get(path)
    val kept = all.filter { abs =>
      val rel = base.relativize(Paths.get(abs)).toString
      // __part_k=v path segments are exact per-file stats (partition
      // pruning unified with footer-stats skipping)
      val partStats: Map[String, (String, String)] = rel.split("/").toSeq
        .filter(_.contains("=")).map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k.stripPrefix("__part_") -> (v, v)
        }.toMap
      val st = stats.getOrElse(rel, Map.empty) ++ partStats
      if (st.isEmpty) true else FileStats.mightMatch(st, pred, schema)
    }
    (kept, all.size)
  }

  /** Snapshot read with stats-based file skipping: `readWhere("l_orderkey
    * = 42")` on a ZORDERed table opens only the overlapping files
    * (`DP/Step 2` pruning behavior). The predicate is still applied. */
  def readWhere(predicateSql: String): DataFrame = {
    val (files, _) = pruneFiles(predicateSql)
    readFiles(files).filter(org.apache.spark.sql.functions.expr(predicateSql))
  }

  /** Write `df` as new immutable files; returns table-relative file paths.
    * Honors `graft.bloomFilterColumns` (comma-separated) via parquet
    * column bloom filters (`CREATE BLOOMFILTER INDEX`, `DP/Step 1:308-313`). */
  private[tables] def writeData(df: DataFrame): Seq[String] = {
    val sub = s"data/${UUID.randomUUID().toString.take(12)}"
    val dest = Paths.get(path, sub)
    val parts = partitionColumns.filter(df.columns.contains)
    // Partition the directory layout by a __part_ COPY of each partition
    // column so the real column stays in the parquet files: reads never
    // depend on partition inference (which breaks across commit dirs) and
    // footer stats cover partition columns too. The duplicate column
    // dict/RLE-encodes to ~nothing.
    val toWrite = parts.foldLeft(df)((d, c) => d.withColumn(s"__part_$c", col(c)))
    val w = properties.get("graft.bloomFilterColumns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty))
      .getOrElse(Array.empty[String])
      .foldLeft(toWrite.write.mode(SaveMode.Overwrite)) { (wr, c) =>
        wr.option(s"parquet.bloom.filter.enabled#$c", "true")
      }
    (if (parts.nonEmpty) w.partitionBy(parts.map("__part_" + _): _*) else w).parquet(dest.toString)
    walkDir(dest)
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(path).relativize(p).toString).sorted
  }

  /** Write a deletion-vector sidecar — rows of (__dv_file, __dv_pos) —
    * and return its table-relative parquet paths plus the row count. */
  private[tables] def writeDv(df: DataFrame): (Seq[String], Long) = {
    val sub = s"dv/${UUID.randomUUID().toString.take(12)}"
    val dest = Paths.get(path, sub)
    df.write.mode(SaveMode.Overwrite).parquet(dest.toString)
    val rels = walkDir(dest)
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(path).relativize(p).toString).sorted
    val rows = FileStats.harvestWithRows(spark,
      rels.map(f => Paths.get(path, f).toString)).values.map(_._1).sum
    (rels, rows)
  }

  private[tables] def writeChanges(df: DataFrame, version: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .parquet(Paths.get(path, "_changes", s"v$version").toString)

  def cdfEnabled: Boolean =
    properties.getOrElse("graft.enableChangeDataFeed", "false") == "true"

  /** Atomically append a commit; throws ConcurrentCommitException if the
    * version was taken by a concurrent writer. */
  private[tables] def commit(
      operation: String,
      added: Seq[String],
      removed: Seq[String],
      schema: StructType,
      params: Map[String, String] = Map.empty,
      props: Map[String, String] = null,
      identity: Long = -1L,
      metrics: Map[String, Long] = Map.empty,
      fileStats: Map[String, Map[String, (String, String)]] = Map.empty,
      addedDv: Seq[String] = Nil,
      removedDv: Seq[String] = Nil,
      schemaUnion: Boolean = false): Commit = {
    Files.createDirectories(logDir)
    val cs = commits
    val prev = cs.lastOption
    // Write-write conflict detection (Delta's ConcurrentDeleteDelete
    // semantics): the version is assigned from the tip read here, so a
    // rewrite computed against an older snapshot would not collide on the
    // version — but if a file this commit removes was already removed by
    // an interleaved commit, both writers rewrote the same rows and
    // publishing would duplicate them. Throw so Concurrency.retry
    // recomputes against the fresh snapshot. Pure appends (removed empty)
    // never conflict, matching Delta's append concurrency.
    if (removed.nonEmpty || removedDv.nonEmpty) {
      val live = scala.collection.mutable.Set[String]()
      val liveDv = scala.collection.mutable.Set[String]()
      cs.foreach { c0 =>
        c0.removedFiles.foreach(live -= _); c0.addedFiles.foreach(live += _)
        c0.removedDvFiles.foreach(liveDv -= _); c0.addedDvFiles.foreach(liveDv += _)
      }
      val gone = removed.filterNot(live) ++ removedDv.filterNot(liveDv)
      if (gone.nonEmpty) throw new ConcurrentCommitException(
        s"concurrent modification: ${gone.size} file(s) this $operation rewrites " +
          s"were already removed by another writer (e.g. ${gone.head})", null)
    }
    // Data operations (append/merge/delete/update/optimize) pass
    // schemaUnion=true: the version is assigned from the tip read HERE,
    // so a writer whose snapshot predates a concurrent schema evolution
    // would otherwise publish its stale captured schema and silently
    // narrow the table (schema regression under racing writers — caught
    // by ConcurrencySpec). Widening is monotone, so union with the
    // current tip's schema is race-safe without a conflict/retry;
    // intentionally exact ops (CREATE/REPLACE/RESTORE) keep union=false.
    val effSchema =
      if (!schemaUnion || prev.isEmpty) schema
      else {
        val tip = DataType.fromJson(prev.get.schemaJson)
        val tipNames = tip.fieldNames.toSet
        StructType(tip.fields ++ schema.fields.filterNot(f => tipNames(f.name)))
      }
    val c = Commit(
      version = prev.map(_.version + 1).getOrElse(0L),
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      operationParameters = params,
      addedFiles = added,
      removedFiles = removed,
      schemaJson = effSchema.json,
      properties = Option(props).getOrElse(prev.map(_.properties).getOrElse(Map.empty)),
      identityHighWatermark =
        if (identity >= 0) identity else prev.map(_.identityHighWatermark).getOrElse(0L),
      metrics = metrics,
      fileStats = fileStats,
      addedDvFiles = addedDv,
      removedDvFiles = removedDv)
    val tmp = Files.createTempFile(logDir, ".commit", ".tmp")
    Files.write(tmp, renderCommit(c).getBytes("UTF-8"))
    val target = logDir.resolve(f"v${c.version}%020d.json")
    // Publish via hard link: link(2) fails with EEXIST *atomically*, so
    // exactly one of N racing writers wins the version. (Files.move
    // without REPLACE_EXISTING is check-then-rename — two racers can both
    // pass the check and the second rename silently clobbers the first,
    // losing a commit; caught by ConcurrencySpec.)
    try {
      try Files.createLink(target, tmp)
      catch { case _: UnsupportedOperationException => Files.move(tmp, target) }
    } catch {
      case NonFatal(e) =>
        throw new ConcurrentCommitException(s"version ${c.version} already committed", e)
    } finally Files.deleteIfExists(tmp)
    // extend the session cache in place (no re-list/re-parse on next read)
    val cachedNow = logCache.get(path)
    if (cachedNow != null && prev.map(_.version).getOrElse(-1L) ==
        cachedNow._2.lastOption.map(_.version).getOrElse(-1L))
      logCache.put(path, (cachedNow._1 :+ target.getFileName.toString, cachedNow._2 :+ c))
    // periodic checkpoint: one file holding the full parsed log so a cold
    // start reads checkpoint + tail instead of every v*.json
    if (c.version > 0 && c.version % checkpointInterval == 0) {
      val all = commits
      val ck = Files.createTempFile(logDir, ".ckpt", ".tmp")
      Files.write(ck, renderCommitList(all).getBytes("UTF-8"))
      Files.move(ck, logDir.resolve(f"checkpoint-v${c.version}%020d.json"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    c
  }

  def append(df: DataFrame, operation: String = "WRITE",
      params: Map[String, String] = Map.empty,
      extraProps: Map[String, String] = Map.empty,
      extraMetrics: Map[String, Long] = Map.empty): Commit = {
    val withId = assignIdentity(df)
    val data = evolveSchema(withId._1)
    val files = writeData(data)
    val (stats, nRows) = harvestStatsAndRows(files)
    val c = commit(operation, files, Nil, data.schema, params,
      props = if (extraProps.isEmpty) null else properties ++ extraProps,
      identity = if (withId._2 >= 0) withId._2 + nRows else -1L,
      metrics = extraMetrics + ("numOutputRows" -> nRows),
      fileStats = stats, schemaUnion = true)
    if (cdfEnabled && files.nonEmpty) writeChanges(
      readFiles(files.map(f => Paths.get(path, f).toString), data.schema)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(c.version)), c.version)
    c
  }

  def overwrite(df: DataFrame, operation: String = "OVERWRITE",
      extraProps: Map[String, String] = Map.empty): Commit = {
    def rel(p: String) = Paths.get(path).relativize(Paths.get(p)).toString
    val removed = filesAt().map(rel)
    val withId = assignIdentity(df)
    val files = writeData(withId._1)
    // stale DV sidecars must go with the data files they index, or they
    // stay live-referenced forever (vacuum can't reclaim, reads keep
    // anti-joining them, clones always take the materialize path)
    commit(operation, files, removed, withId._1.schema, identity = withId._2,
      props = if (extraProps.isEmpty) null else properties ++ extraProps,
      fileStats = harvestStats(files),
      removedDv = dvAt().map(rel))
  }

  /** Overwrite CONDITIONED ON A SNAPSHOT: removes exactly
    * `snapshotFiles` (absolute paths — the file list the caller READ
    * before computing `df`). If an interleaved commit already removed
    * any of them, the write-write conflict check throws
    * [[GraftTable.ConcurrentCommitException]] so `Concurrency.retry`
    * can recompute from the fresh tip — the read-modify-write
    * protection a plain [[overwrite]] cannot give (its removed list is
    * re-listed at commit time, so a stale rewrite would silently
    * replace an interleaved writer's commit). Index-maintenance callers
    * (e.g. the Bloom dedup index) read state, merge, and publish with
    * this. */
  def overwriteSnapshot(df: DataFrame, snapshotFiles: Seq[String],
      operation: String = "OVERWRITE",
      extraProps: Map[String, String] = Map.empty): Commit = {
    def rel(p: String) = Paths.get(path).relativize(Paths.get(p)).toString
    val removed = snapshotFiles.map(rel)
    val withId = assignIdentity(df)
    val files = writeData(withId._1)
    commit(operation, files, removed, withId._1.schema, identity = withId._2,
      props = if (extraProps.isEmpty) null else properties ++ extraProps,
      fileStats = harvestStats(files),
      removedDv = dvAt().map(rel))
  }

  /** TRUNCATE: drop every live file, keep schema (`DP/Step 1:231`). */
  def truncate(): Commit = {
    def rel(p: String) = Paths.get(path).relativize(Paths.get(p)).toString
    commit("TRUNCATE", Nil, filesAt().map(rel), schemaAt(),
      removedDv = dvAt().map(rel))
  }

  /** RESTORE TO TIMESTAMP AS OF: repoint to the snapshot current at `tsMs`. */
  def restoreToTimestamp(tsMs: Long): Commit = restoreTo(versionAtTimestamp(tsMs))

  /** RESTORE TABLE ... VERSION AS OF v (`HF/transactions.py:420-449`). */
  def restoreTo(version: Long): Commit = {
    def rel(p: String) = Paths.get(path).relativize(Paths.get(p)).toString
    val want = filesAt(version).map(rel)
    val cur = filesAt().map(rel)
    val wantDv = dvAt(version).map(rel)
    val curDv = dvAt().map(rel)
    commit("RESTORE", want.diff(cur), cur.diff(want), schemaAt(version),
      Map("restoredVersion" -> version.toString),
      addedDv = wantDv.diff(curDv), removedDv = curDv.diff(wantDv))
  }

  /** Number of versions committed within the last `hours` (age→version
    * retention conversion for VACUUM RETAIN ... HOURS). */
  def versionsWithinHours(hours: Double): Int = {
    val horizon = System.currentTimeMillis() - (hours * 3600 * 1000).toLong
    commits.count(_.timestampMs >= horizon)
  }

  /** VACUUM with the default 7-day safety window (the reference's
    * default): every version committed in the last 7 days stays
    * time-travelable; only files referenced by no retained version are
    * deleted. */
  def vacuum(): Seq[String] = vacuum(versionsWithinHours(7 * 24))

  /** VACUUM: physically delete files no longer referenced by any version
    * newer than the retention horizon. `retainVersions = 0` keeps only
    * the current snapshot — time travel, RESTORE, shallow clones, and
    * rollback to older versions stop working; the SQL route requires an
    * explicit FORCE for it. */
  def vacuum(retainVersions: Int): Seq[String] = {
    val keepFrom = math.max(0L, currentVersion - retainVersions)
    val referenced = (keepFrom to currentVersion)
      .flatMap(v => filesAt(v) ++ dvAt(v))
      .map(f => Paths.get(f).toAbsolutePath.normalize.toString).toSet
    val dvDir = Paths.get(path, "dv")
    val roots = Seq(dataDir, dvDir).filter(Files.isDirectory(_))
    if (roots.isEmpty) return Nil
    val deleted = roots.flatMap(walkDir)
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filterNot(p => referenced.contains(p.toAbsolutePath.normalize.toString))
      .toList
    deleted.foreach(Files.delete)
    deleted.map(_.toString)
  }

  /** DEEP CLONE: copy live files + fresh single-commit log
    * (`10-migrations/05-uc-upgrade`). */
  def cloneTo(destPath: String): GraftTable = {
    // DV sidecars key on the source's file URIs, which change under
    // copy/symlink — clones of DV-carrying tables materialize the deletes
    if (dvAt().nonEmpty) {
      val dest = GraftTable.create(spark, destPath, schemaAt(), properties)
      dest.append(read(), "CLONE", Map("source" -> path, "materializedDv" -> "true"))
      return dest
    }
    val dest = GraftTable.create(spark, destPath, schemaAt(), properties)
    def copyAll(srcs: Seq[String], sub: String): Seq[String] = srcs.map { src =>
      val rel = s"$sub/clone-${UUID.randomUUID().toString.take(8)}-${Paths.get(src).getFileName}"
      val d = Paths.get(destPath, rel)
      Files.createDirectories(d.getParent)
      Files.copy(Paths.get(src), d, StandardCopyOption.REPLACE_EXISTING)
      rel
    }
    dest.commit("CLONE", copyAll(filesAt(), "data"), Nil, schemaAt(),
      Map("source" -> path))
    dest
  }

  /** SHALLOW CLONE: new table whose commit references the source's live
    * files in place (metadata-only, zero data copy). Caveat (same as
    * Delta's): VACUUMing the source after it rewrites breaks the clone's
    * links — deep-clone or re-clone before vacuuming the source. */
  def shallowCloneTo(destPath: String): GraftTable = {
    if (dvAt().nonEmpty) return cloneTo(destPath) // see cloneTo: DV paths don't survive links
    val dest = GraftTable.create(spark, destPath, schemaAt(), properties)
    // absolute source paths recorded relative to the dest via ".." hops is
    // brittle; store absolute by making the commit path-relative a no-op:
    // we register files under a symlink dir inside the clone.
    def linkAll(srcs: Seq[String], sub: String): Seq[String] = {
      val linkDir = Paths.get(destPath, sub, "shallow")
      Files.createDirectories(linkDir)
      srcs.zipWithIndex.map { case (src, i) =>
        val link = linkDir.resolve(f"f$i%05d-${Paths.get(src).getFileName}")
        Files.createSymbolicLink(link, Paths.get(src).toAbsolutePath)
        Paths.get(destPath).relativize(link).toString
      }
    }
    dest.commit("SHALLOW CLONE", linkAll(filesAt(), "data"), Nil, schemaAt(),
      Map("source" -> path))
    dest
  }

  def setProperties(kv: Map[String, String]): Commit =
    commit("SET TBLPROPERTIES", Nil, Nil, schemaAt(), props = properties ++ kv)

  /** ALTER ... SYNC IDENTITY (`DP/Step 13:25-57`): reset the high-water
    * counter to max(id) actually present. */
  def syncIdentity(): Commit = {
    val idCol = properties.getOrElse("graft.identity.column", "")
    require(idCol.nonEmpty, "no identity column configured")
    val mx = read().agg(max(col(idCol))).head().getLong(0)
    commit("SYNC IDENTITY", Nil, Nil, schemaAt(), identity = mx)
  }

  /** Schema evolution on append (`mergeSchema` semantics,
    * `C360/01.5:161`): the table schema becomes old ∪ new columns; rows
    * missing a column carry null (old files read null for new columns via
    * parquet by-name resolution). */
  private def evolveSchema(df: DataFrame): DataFrame = {
    if (commits.isEmpty) return df
    val old = schemaAt()
    if (old.fieldNames.toSeq == df.schema.fieldNames.toSeq) return df
    val oldNames = old.fieldNames.toSet
    val merged = StructType(
      old.fields ++ df.schema.fields.filterNot(f => oldNames(f.name)))
    val filled = merged.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType))
    }
    filled.select(merged.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  /** If an identity column is configured and absent in `df`, assign dense
    * ids above the high watermark. Per-partition offsets come from one
    * count pass, then the ids are stamped in the write pass itself — two
    * jobs total (dense sequential ids cannot be done in fewer), no
    * driver-side loop, so this scales to arbitrarily large appends.
    * Returns (df-with-ids, previous high watermark) — the caller advances
    * the watermark by the committed row count, so no extra count() job. */
  private def assignIdentity(df: DataFrame): (DataFrame, Long) = {
    val idCol = properties.getOrElse("graft.identity.column", "")
    if (idCol.isEmpty || df.columns.contains(idCol)) return (df, -1L)
    val hw = identityHighWatermark
    val schema = StructType(
      org.apache.spark.sql.types.StructField(idCol, LongType, nullable = false) +: df.schema.fields)
    val rdd0 = df.rdd
    val counts = rdd0.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var next = hw + offsets(i)
      it.map { r => next += 1; Row.fromSeq(next +: r.toSeq) }
    }
    (spark.createDataFrame(rdd, schema), hw)
  }
}

object GraftTable {
  // expose DataType.fromJson under a stable name
  private[tables] object DataType {
    def fromJson(json: String): StructType =
      org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }

  private val M = new ObjectMapper()

  /** Access-ordered LRU map bounded at `maxEntries` tables — the
    * metadata caches below must not grow with the number of DISTINCT
    * tables a long-lived session ever touches (a streaming service
    * churning scratch tables would otherwise leak). 512 live tables of
    * cached metadata is far beyond any single session's working set;
    * eviction just means a cold reload through the checkpoint path. */
  private def lruMap[V](maxEntries: Int): java.util.Map[String, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, V](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
          size() > maxEntries
      })

  /** Session-wide parsed-log cache: table path → (sorted commit-file
    * names, parsed commits). Shared across GraftTable instances so
    * repeated `load()`s of the same table stay O(1). */
  private val logCache = lruMap[(Vector[String], Vector[Commit])](512)

  private[tables] def clearLogCache(path: String): Unit = {
    logCache.remove(path)
    statsCache.remove(path)
  }

  /** Drop every cached parsed log / stats map (benchmark-harness reset:
    * scratch tables are deleted between queries; their cache entries would
    * otherwise accumulate for the whole run). */
  def clearAllCaches(): Unit = {
    logCache.clear()
    statsCache.clear()
  }

  /** Live-version stats map per table path: (version, rel path → col →
    * (min,max)). See [[GraftTable.statsAt]]. */
  private val statsCache =
    lruMap[(Long, Map[String, Map[String, (String, String)]])](512)

  /** Count of full stats-map folds — observable in tests asserting the
    * map is materialized once across repeated `readWhere` calls. */
  private[tables] val statsMaterializations =
    new java.util.concurrent.atomic.AtomicLong()

  /** Count of physical log-file reads (commit files + checkpoints) —
    * observable in tests asserting O(1) reads after warm-up. */
  private[tables] val logFileReads = new java.util.concurrent.atomic.AtomicLong()

  /** Commits between state checkpoints (cold-start reads ckpt + tail). */
  private val checkpointInterval = 10L

  /** Column names for deletion-vector provenance (file URI + row index). */
  private[graft] val DvFileCol = "__dv_file"
  private[graft] val DvPosCol = "__dv_pos"

  /** Loan-pattern directory listing/walk — the returned streams hold an
    * open directory FD until closed, which leaks under the idiomatic
    * `.iterator().asScala` chaining. */
  private[tables] def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private[tables] def walkDir(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Evict cached parsed logs / stats for every table at or under `root`.
    * Without this a table deleted and recreated at the same path can be
    * served another table's cached stats (same tip version, different
    * files) — and long-lived non-bench sessions would grow the caches
    * unboundedly as scratch tables churn. */
  private def evictCachesUnder(root: Path): Unit = {
    val r = root.toAbsolutePath.normalize.toString
    val prefix = r + java.io.File.separator
    def hit(k: String): Boolean = {
      val a = Paths.get(k).toAbsolutePath.normalize.toString
      a == r || a.startsWith(prefix)
    }
    // synchronizedMap contract: hold the map's monitor while iterating
    def evict[V](m: java.util.Map[String, V]): Unit = {
      val keys = m.synchronized { m.keySet.asScala.toList }
      keys.filter(hit).foreach(m.remove)
    }
    evict(logCache)
    evict(statsCache)
  }

  /** Best-effort recursive delete (no-op on a missing path; per-path IO
    * errors skipped) — shared by the bench harness and scratch-table
    * cleanup so the walk-sort-delete loop lives once. Also evicts the
    * parsed-log/stats cache entries of every table under the tree, so a
    * recreate at the same path can never be served stale state. */
  def deleteTree(p: Path): Unit =
    if (Files.isDirectory(p) || Files.isRegularFile(p)) {
      evictCachesUnder(p)
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(q =>
          try { Files.deleteIfExists(q); () }
          catch { case _: java.io.IOException => () })
      finally s.close()
    }

  class ConcurrentCommitException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  def create(spark: SparkSession, path: String, schema: StructType,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val t = new GraftTable(spark, path)
    Files.createDirectories(Paths.get(path))
    t.commit("CREATE TABLE", Nil, Nil, schema, props = properties)
    t
  }

  def createFrom(spark: SparkSession, path: String, df: DataFrame,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val t = create(spark, path, df.schema, properties)
    t.append(df, "CREATE TABLE AS SELECT")
    t
  }

  def load(spark: SparkSession, path: String): GraftTable = {
    val t = new GraftTable(spark, path)
    require(t.commits.nonEmpty, s"not a graft table: $path")
    t
  }

  def exists(path: String): Boolean =
    Files.isDirectory(Paths.get(path, "_log"))

  // ---- JSON (Jackson ships with Spark; no extra deps) --------------------

  private[tables] def renderCommit(c: Commit): String = {
    val n = M.createObjectNode()
    n.put("version", c.version)
    n.put("timestampMs", c.timestampMs)
    n.put("operation", c.operation)
    val p = n.putObject("operationParameters")
    c.operationParameters.foreach { case (k, v) => p.put(k, v) }
    val a = n.putArray("addedFiles"); c.addedFiles.foreach(a.add)
    val r = n.putArray("removedFiles"); c.removedFiles.foreach(r.add)
    n.put("schemaJson", c.schemaJson)
    val pr = n.putObject("properties")
    c.properties.foreach { case (k, v) => pr.put(k, v) }
    n.put("identityHighWatermark", c.identityHighWatermark)
    val m = n.putObject("metrics")
    c.metrics.foreach { case (k, v) => m.put(k, v) }
    val fs = n.putObject("fileStats")
    c.fileStats.foreach { case (file, cols) =>
      val fo = fs.putObject(file)
      cols.foreach { case (cname, (mn, mx)) =>
        val arr = fo.putArray(cname); arr.add(mn); arr.add(mx)
      }
    }
    val adv = n.putArray("addedDvFiles"); c.addedDvFiles.foreach(adv.add)
    val rdv = n.putArray("removedDvFiles"); c.removedDvFiles.foreach(rdv.add)
    M.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  private[tables] def renderCommitList(cs: Seq[Commit]): String =
    cs.map(renderCommit).mkString("[", ",\n", "]")

  private[tables] def parseCommitList(json: String): Seq[Commit] =
    M.readTree(json).elements().asScala.map(parseNode).toSeq

  private[tables] def parseCommit(json: String): Commit = parseNode(M.readTree(json))

  private def parseNode(n: JsonNode): Commit = {
    def strMap(f: JsonNode): Map[String, String] =
      f.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    Commit(
      version = n.get("version").asLong(),
      timestampMs = n.get("timestampMs").asLong(),
      operation = n.get("operation").asText(),
      operationParameters = strMap(n.get("operationParameters")),
      addedFiles = n.get("addedFiles").elements().asScala.map(_.asText()).toSeq,
      removedFiles = n.get("removedFiles").elements().asScala.map(_.asText()).toSeq,
      schemaJson = n.get("schemaJson").asText(),
      properties = strMap(n.get("properties")),
      identityHighWatermark = n.get("identityHighWatermark").asLong(),
      metrics = n.get("metrics").fields().asScala
        .map(e => e.getKey -> e.getValue.asLong()).toMap,
      fileStats = Option(n.get("fileStats")).map(fs =>
        fs.fields().asScala.map { e =>
          e.getKey -> e.getValue.fields().asScala.map { ce =>
            ce.getKey -> (ce.getValue.get(0).asText(), ce.getValue.get(1).asText())
          }.toMap
        }.toMap).getOrElse(Map.empty),
      addedDvFiles = Option(n.get("addedDvFiles"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
      removedDvFiles = Option(n.get("removedDvFiles"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))
  }
}

/** Optimistic-concurrency retry with exponential backoff, mirroring
  * `DeltaMergeHelpers.retrySqlStatement` (`HF/deltahelpers.py:132-172`). */
object Concurrency {
  def retry[A](maxTries: Int = 5, baseDelayMs: Long = 100)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: GraftTable.ConcurrentCommitException =>
          attempt += 1
          if (attempt >= maxTries) throw e
          Thread.sleep(baseDelayMs * (1L << attempt))
      }
    }
    sys.error("unreachable")
  }
}
