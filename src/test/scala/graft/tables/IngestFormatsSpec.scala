package graft.tables

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class IngestFormatsSpec extends SparkTestBase {

  test("COPY INTO loads CSV with header via FORMAT_OPTIONS") {
    val dir = Paths.get(scratch("csv-src"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.csv"), "id,name\n1,alpha\n2,beta\n".getBytes("UTF-8"))
    Files.write(dir.resolve("b.csv"), "id,name\n3,gamma\n".getBytes("UTF-8"))
    val g = new graft.sql.GraftSql(spark, scratch("csv-tbl"))
    g.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType))))
    g.sql(s"""COPY INTO t FROM '$dir' FILEFORMAT = CSV
              PATTERN = '*.csv' FORMAT_OPTIONS('header'='true')""")
    val rows = g.table("t").read().orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("alpha", "beta", "gamma"))
    // idempotent on re-run
    g.sql(s"""COPY INTO t FROM '$dir' FILEFORMAT = CSV
              PATTERN = '*.csv' FORMAT_OPTIONS('header'='true')""")
    assert(g.table("t").read().count() === 3)
  }

  test("COPY INTO loads JSON with inline cast subquery") {
    val dir = Paths.get(scratch("json-src"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.json"),
      "{\"id\": \"7\", \"v\": 1.5}\n{\"id\": \"8\", \"v\": 2.5}\n".getBytes("UTF-8"))
    val g = new graft.sql.GraftSql(spark, scratch("json-tbl"))
    g.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    g.sql(s"""COPY INTO t FROM (SELECT CAST(id AS BIGINT) AS id, v FROM '$dir')
              FILEFORMAT = JSON""")
    val rows = g.table("t").read().orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(7L, 8L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5))
  }

  test("COPY INTO loads ORC through the generic format branch") {
    val dir = scratch("orc-src")
    graft.Tables.t(spark, sf, "region").write.orc(dir)
    val t = GraftTable.create(spark, scratch("orc-tbl"),
      graft.Tables.t(spark, sf, "region").schema)
    Ingest.copyInto(t, dir, format = "orc", pattern = "*.orc")
    assert(t.read().count() === 5)
  }
}
