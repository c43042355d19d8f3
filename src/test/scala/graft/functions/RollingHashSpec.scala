package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  private def ref(s: String): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach(b => h = (h * 31L + (b & 0xffL)) & ((1L << 56) - 1))
    h
  }

  test("rolling_hash matches the reference computation (interpreted + codegen)") {
    val df = Seq("hello", "", "a", "the quick brown fox", "ünïcodé").toDF("s")
    val got = df.select(GraftFunctions.rolling_hash(spark, col("s")))
      .collect().map(_.getLong(0))
    val want = Seq("hello", "", "a", "the quick brown fox", "ünïcodé").map(ref)
    assert(got.toSeq === want)
  }

  test("participates in whole-stage codegen (no fallback)") {
    val df = Tables.t(spark, sf, "documents")
      .select(GraftFunctions.rolling_hash(spark, col("text")).as("h"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rolling_hash"))
    // and it actually evaluates over real data
    assert(df.distinct().count() === 500)
  }

  test("registered for SQL use") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT rolling_hash('hello') AS h").head().getLong(0)
    assert(h === ref("hello"))
  }

  test("null propagates, non-string input rejected") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT rolling_hash(CAST(NULL AS STRING))").head().isNullAt(0))
    intercept[Exception] { spark.sql("SELECT rolling_hash(42)").collect() }
  }
}
