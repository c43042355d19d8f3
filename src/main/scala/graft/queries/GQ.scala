package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalogued query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names/order-by must match exactly (driver hashes
  * column-sorted values).
  */
final case class GQ(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryBatch {
  def queries: Seq[GQ]
}
