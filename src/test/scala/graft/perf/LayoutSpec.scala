package graft.perf

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class LayoutSpec extends SparkTestBase {

  test("salted join equals plain join on skewed data") {
    val li = Tables.t(spark, sf, "lineitem")
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Layout.saltedJoin(li, o, "l_orderkey", saltFactor = 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      Layout.writeBucketed(
        Tables.t(spark, sf, "lineitem"), "b_lineitem", Seq("l_orderkey"), 4)
      Layout.writeBucketed(
        Tables.t(spark, sf, "orders")
          .withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders",
        Seq("l_orderkey"), 4)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
      assert(Layout.isShuffleFree(joined))
      assert(joined.count() === Tables.t(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
