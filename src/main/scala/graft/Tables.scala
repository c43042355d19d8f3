package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table access (TESTDATA.md): one parquet file per table under
  * the scale-factor dir. At 100 TB these would be partitioned/bucketed
  * directories; the access path is identical (`spark.read.parquet(dir)`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Testdata timestamp normalization, in one place so every query sees
    // TIMESTAMP (LTZ, session tz = UTC) regardless of how the driver's
    // generator wrote the parquet:
    //  - TIMESTAMP(NANOS) is rejected by Spark's vectorized reader: read
    //    nanos as long and truncate to micros (DuckDB's CAST truncates
    //    identically).
    //  - naive timestamp[us] (isAdjustedToUTC=false) reads as
    //    TIMESTAMP_NTZ under Spark 4's NTZ inference; cast to TIMESTAMP —
    //    value-identical under the UTC session tz and what DuckDB's naive
    //    timestamps compare equal to.
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
  }

  /** Register every testdata table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
