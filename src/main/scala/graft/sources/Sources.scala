package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** External-system source interfaces (SURVEY §2.1).
  *
  * This environment has zero egress and no JDBC drivers, so these keep the
  * reference's interfaces without live connectivity:
  *
  *  - `jdbc` configures Spark's built-in JDBC source (the
  *    RedshiftChecker-style remote pull, `HF/redshiftchecker.py:83-98`);
  *    it fails at connect time here but is the production call shape.
  *  - `fromRows` rehydrates client-fetched records (the SQL-over-REST /
  *    API-to-DataFrame path, `HF/dbsqlclient.py:328-407`,
  *    `OBS/dbsql-logging/03-APIs_to_Delta.py`): an HTTP client produces
  *    rows, Spark takes over from there.
  */
object Sources {

  /** Remote query via JDBC (partitioned read when bounds are given). */
  def jdbc(spark: SparkSession, url: String, query: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(options)
      .load()

  /** DataFrame from client-fetched rows + declared schema (the REST
    * rehydration pattern: poll API → JSON chunks → rows → DataFrame). */
  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)

  /** Compare a local table against a remote source's pull: schema equality
    * plus row-level hash diff (RedshiftChecker.compare semantics,
    * `HF/redshiftchecker.py:120-150`). */
  def compareWithRemote(local: DataFrame, remote: DataFrame):
      graft.services.DataValidator.ValidationReport = {
    require(local.schema.fieldNames.sorted.sameElements(remote.schema.fieldNames.sorted),
      s"schema mismatch: ${local.schema.fieldNames.mkString(",")} vs " +
        remote.schema.fieldNames.mkString(","))
    graft.services.DataValidator.compare(local, remote)
  }
}
