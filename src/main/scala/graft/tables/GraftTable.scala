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
    fileStats: Map[String, Map[String, (String, String)]] = Map.empty)

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

  def commits: Seq[Commit] = {
    if (!Files.isDirectory(logDir)) return Nil
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => parseCommit(new String(Files.readAllBytes(p), "UTF-8")))
  }

  def currentVersion: Long = commits.lastOption.map(_.version).getOrElse(-1L)

  def commitAt(version: Long): Commit =
    commits.find(_.version == version).getOrElse(
      throw new IllegalArgumentException(s"$path has no version $version"))

  /** Live data files (absolute paths) at a version (default: latest). */
  def filesAt(version: Long = Long.MaxValue): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    commits.takeWhile(_.version <= version).foreach { c =>
      c.removedFiles.foreach(live -= _)
      c.addedFiles.foreach(live += _)
    }
    live.toSeq.map(f => Paths.get(path, f).toString)
  }

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
  private[graft] def readFiles(files: Seq[String], readSchema: StructType = null): DataFrame = {
    val s = Option(readSchema).getOrElse(schemaAt())
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    else spark.read.schema(s).option("recursiveFileLookup", "true").parquet(files: _*)
  }

  /** Snapshot read (optionally `VERSION AS OF`). */
  def read(versionAsOf: Long = Long.MaxValue): DataFrame =
    readFiles(filesAt(versionAsOf), schemaAt(versionAsOf))

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
  private[tables] def harvestStats(relFiles: Seq[String]): Map[String, Map[String, (String, String)]] = {
    val abs = relFiles.map(f => Paths.get(path, f).toString)
    val h = FileStats.harvest(spark, abs)
    relFiles.zip(abs).map { case (rel, a) => rel -> h.getOrElse(a, Map.empty) }
      .filter(_._2.nonEmpty).toMap
  }

  /** Per-file stats of the live files at a version (rel path → col →
    * (min,max)). */
  def statsAt(version: Long = Long.MaxValue): Map[String, Map[String, (String, String)]] =
    commits.takeWhile(_.version <= version)
      .foldLeft(Map.empty[String, Map[String, (String, String)]])(_ ++ _.fileStats)

  /** Stats-pruned file list for a conjunctive predicate: only files whose
    * min/max ranges can match. Falls back to all files on unknown shapes. */
  def pruneFiles(predicateSql: String): (Seq[String], Int) = {
    val all = filesAt()
    val stats = statsAt()
    val schema = schemaAt()
    val pred =
      try spark.sessionState.sqlParser.parseExpression(predicateSql)
      catch { case NonFatal(_) => return (all, all.size) }
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
    Files.walk(dest).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(path).relativize(p).toString).toSeq.sorted
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
      fileStats: Map[String, Map[String, (String, String)]] = Map.empty): Commit = {
    Files.createDirectories(logDir)
    val prev = commits.lastOption
    val c = Commit(
      version = prev.map(_.version + 1).getOrElse(0L),
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      operationParameters = params,
      addedFiles = added,
      removedFiles = removed,
      schemaJson = schema.json,
      properties = Option(props).getOrElse(prev.map(_.properties).getOrElse(Map.empty)),
      identityHighWatermark =
        if (identity >= 0) identity else prev.map(_.identityHighWatermark).getOrElse(0L),
      metrics = metrics,
      fileStats = fileStats)
    val tmp = Files.createTempFile(logDir, ".commit", ".tmp")
    Files.write(tmp, renderCommit(c).getBytes("UTF-8"))
    val target = logDir.resolve(f"v${c.version}%020d.json")
    try Files.move(tmp, target) // no REPLACE_EXISTING: loser of the race throws
    catch {
      case NonFatal(e) =>
        Files.deleteIfExists(tmp)
        throw new ConcurrentCommitException(s"version ${c.version} already committed", e)
    }
    c
  }

  def append(df: DataFrame, operation: String = "WRITE",
      params: Map[String, String] = Map.empty): Commit = {
    val withId = assignIdentity(df)
    val data = evolveSchema(withId._1)
    val files = writeData(data)
    val c = commit(operation, files, Nil, data.schema, params, identity = withId._2,
      fileStats = harvestStats(files))
    if (cdfEnabled && files.nonEmpty) writeChanges(
      readFiles(files.map(f => Paths.get(path, f).toString), data.schema)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(c.version)), c.version)
    c
  }

  def overwrite(df: DataFrame, operation: String = "OVERWRITE"): Commit = {
    val removed = filesAt().map(abs => Paths.get(path).relativize(Paths.get(abs)).toString)
    val withId = assignIdentity(df)
    val files = writeData(withId._1)
    commit(operation, files, removed, withId._1.schema, identity = withId._2,
      fileStats = harvestStats(files))
  }

  /** TRUNCATE: drop every live file, keep schema (`DP/Step 1:231`). */
  def truncate(): Commit = {
    val removed = filesAt().map(abs => Paths.get(path).relativize(Paths.get(abs)).toString)
    commit("TRUNCATE", Nil, removed, schemaAt())
  }

  /** RESTORE TABLE ... VERSION AS OF v (`HF/transactions.py:420-449`). */
  def restoreTo(version: Long): Commit = {
    val want = filesAt(version).map(abs => Paths.get(path).relativize(Paths.get(abs)).toString)
    val cur = filesAt().map(abs => Paths.get(path).relativize(Paths.get(abs)).toString)
    commit("RESTORE", want.diff(cur), cur.diff(want), schemaAt(version),
      Map("restoredVersion" -> version.toString))
  }

  /** VACUUM: physically delete files no longer referenced by any version
    * newer than the retention horizon. */
  def vacuum(retainVersions: Int = 0): Seq[String] = {
    val keepFrom = math.max(0L, currentVersion - retainVersions)
    val referenced = (keepFrom to currentVersion).flatMap(filesAt(_))
      .map(f => Paths.get(f).toAbsolutePath.normalize.toString).toSet
    if (!Files.isDirectory(dataDir)) return Nil
    val deleted = Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filterNot(p => referenced.contains(p.toAbsolutePath.normalize.toString))
      .toList
    deleted.foreach(Files.delete)
    deleted.map(_.toString)
  }

  /** DEEP CLONE: copy live files + fresh single-commit log
    * (`10-migrations/05-uc-upgrade`). */
  def cloneTo(destPath: String): GraftTable = {
    val dest = GraftTable.create(spark, destPath, schemaAt(), properties)
    val files = filesAt()
    val copied = files.map { src =>
      val rel = s"data/clone-${UUID.randomUUID().toString.take(8)}-${Paths.get(src).getFileName}"
      val d = Paths.get(destPath, rel)
      Files.createDirectories(d.getParent)
      Files.copy(Paths.get(src), d, StandardCopyOption.REPLACE_EXISTING)
      rel
    }
    dest.commit("CLONE", copied, Nil, schemaAt(), Map("source" -> path))
    dest
  }

  /** SHALLOW CLONE: new table whose commit references the source's live
    * files in place (metadata-only, zero data copy). Caveat (same as
    * Delta's): VACUUMing the source after it rewrites breaks the clone's
    * links — deep-clone or re-clone before vacuuming the source. */
  def shallowCloneTo(destPath: String): GraftTable = {
    val dest = GraftTable.create(spark, destPath, schemaAt(), properties)
    // absolute source paths recorded relative to the dest via ".." hops is
    // brittle; store absolute by making the commit path-relative a no-op:
    // we register files under a symlink dir inside the clone.
    val linkDir = Paths.get(destPath, "data", "shallow")
    Files.createDirectories(linkDir)
    val rels = filesAt().zipWithIndex.map { case (src, i) =>
      val link = linkDir.resolve(f"f$i%05d-${Paths.get(src).getFileName}")
      Files.createSymbolicLink(link, Paths.get(src).toAbsolutePath)
      Paths.get(destPath).relativize(link).toString
    }
    dest.commit("SHALLOW CLONE", rels, Nil, schemaAt(), Map("source" -> path))
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

  /** If an identity column is configured and absent/null in `df`, assign
    * ids above the high watermark. Ids are allocated per-commit from the
    * log (SURVEY.md §7.4) — per-partition offsets via zipWithIndex, no
    * driver-side loop, so this scales to arbitrarily large appends. */
  private def assignIdentity(df: DataFrame): (DataFrame, Long) = {
    val idCol = properties.getOrElse("graft.identity.column", "")
    if (idCol.isEmpty || df.columns.contains(idCol)) return (df, -1L)
    val hw = identityHighWatermark
    val schema = StructType(
      org.apache.spark.sql.types.StructField(idCol, LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((hw + 1 + i) +: r.toSeq)
    }
    val n = df.count()
    (spark.createDataFrame(rdd, schema), hw + n)
  }
}

object GraftTable {
  // expose DataType.fromJson under a stable name
  private[tables] object DataType {
    def fromJson(json: String): StructType =
      org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }

  private val M = new ObjectMapper()

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
    M.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  private[tables] def parseCommit(json: String): Commit = {
    val n = M.readTree(json)
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
        }.toMap).getOrElse(Map.empty))
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
