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
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as long and truncate to micros (DuckDB's
    // CAST(ts_ns AS TIMESTAMP) truncates identically).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)
  }

  /** Register every testdata table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
