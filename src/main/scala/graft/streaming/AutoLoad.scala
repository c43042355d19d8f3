package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType, StringType}

/** Auto-Loader-style incremental file ingestion (`DP/Step 5:100-116`,
  * `C360/01.5:151-167`): schema inference persisted at a schema location,
  * schema hints, `_rescued_data` for non-conforming input, rate limiting
  * via `maxFilesPerTrigger`, glob filtering.
  *
  * Built on Spark's streaming file source, which tracks seen files in the
  * checkpoint for exactly-once — the same contract Auto Loader provides.
  * At scale the file listing is the bottleneck; Spark's source handles
  * incremental listing, and `maxFilesPerTrigger` bounds micro-batch size.
  */
object AutoLoad {

  /** Infer the schema once from existing files and persist it (the
    * `cloudFiles.schemaLocation` behavior); later runs reuse the stored
    * schema so streams restart deterministically. */
  def inferOrLoadSchema(
      spark: SparkSession,
      path: String,
      format: String,
      schemaLocation: String,
      options: Map[String, String] = Map.empty,
      hints: Map[String, DataType] = Map.empty): StructType = {
    val f = Paths.get(schemaLocation, "_schema.json")
    if (Files.exists(f)) {
      DataType.fromJson(new String(Files.readAllBytes(f), "UTF-8")).asInstanceOf[StructType]
    } else {
      val sample = spark.read.options(options).format(format).load(path)
      val hinted = StructType(sample.schema.map(fd =>
        hints.get(fd.name).map(dt => fd.copy(dataType = dt)).getOrElse(fd)))
      Files.createDirectories(f.getParent)
      Files.write(f, hinted.json.getBytes("UTF-8"))
      hinted
    }
  }

  /** Open an incremental file stream with Auto Loader semantics.
    * For json/csv a `_rescued_data` column captures non-conforming rows
    * (PERMISSIVE parse + columnNameOfCorruptRecord). */
  def readStream(
      spark: SparkSession,
      path: String,
      format: String,
      schemaLocation: String,
      options: Map[String, String] = Map.empty,
      hints: Map[String, DataType] = Map.empty,
      maxFilesPerTrigger: Option[Int] = None,
      pathGlobFilter: Option[String] = None,
      rescue: Boolean = true): DataFrame = {
    val withRescue = format match {
      case "json" | "csv" if rescue => true
      case _ => false
    }
    val base = inferOrLoadSchema(spark, path, format, schemaLocation, options, hints)
    val schema =
      if (withRescue && !base.fieldNames.contains("_rescued_data"))
        base.add("_rescued_data", StringType)
      else base
    var r = spark.readStream.options(options).schema(schema)
    if (withRescue) r = r
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_rescued_data")
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    pathGlobFilter.foreach(g => r = r.option("pathGlobFilter", g))
    r.format(format).load(path)
  }
}
