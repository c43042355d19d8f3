package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Append-only delta-log aggregate semantics: exact fold over any mix of
  * compacted rows and pending deltas, compaction preserving totals while
  * collapsing physical rows, zero-rewrite appends, and the cadence. */
class LogAggSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  private def mk(name: String) =
    LogAgg.create(spark, scratch(name), schema, Seq("k"), Seq("n"))

  test("read folds pending deltas exactly; appends never rewrite") {
    val t = mk("la_fold")
    LogAgg.append(t, Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))
    LogAgg.append(t, Seq(("a", 10L), ("c", 5L)).toDF("k", "n"))
    val got = LogAgg.read(t).orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 11L), ("b", 2L), ("c", 5L)))
    assert(t.commits.filter(_.operation == "LOGAGG DELTA")
      .forall(_.removedFiles.isEmpty))
  }

  test("compact collapses physical rows, aggregate unchanged; mixed read stays exact") {
    val t = mk("la_compact")
    LogAgg.append(t, Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))
    LogAgg.append(t, Seq(("a", 3L)).toDF("k", "n"))
    val before = LogAgg.read(t).orderBy("k").collect().toSeq
    LogAgg.compact(t)
    assert(LogAgg.read(t).orderBy("k").collect().toSeq == before)
    // physically one row per key now
    assert(t.read().count() == 2)
    // a delta landing AFTER the compact folds into the compacted rows
    LogAgg.append(t, Seq(("b", 40L), ("z", 1L)).toDF("k", "n"))
    val got = LogAgg.read(t).orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 4L), ("b", 42L), ("z", 1L)))
  }

  test("compactIfDue honors the cadence and resets it") {
    val t = mk("la_due")
    LogAgg.append(t, Seq(("a", 1L)).toDF("k", "n"))
    assert(LogAgg.compactIfDue(t, every = 2).isEmpty)
    LogAgg.append(t, Seq(("a", 1L)).toDF("k", "n"))
    assert(LogAgg.compactIfDue(t, every = 2).isDefined)
    // cadence restarts after the compact
    assert(LogAgg.deltasSinceCompact(t) == 0)
    LogAgg.append(t, Seq(("a", 1L)).toDF("k", "n"))
    assert(LogAgg.compactIfDue(t, every = 2).isEmpty)
    assert(LogAgg.read(t).as[(String, Long)].collect().toSeq == Seq(("a", 3L)))
  }

  test("a non-LogAgg table is rejected with a pointed error") {
    val plain = GraftTable.create(spark, scratch("la_plain"), schema)
    intercept[IllegalArgumentException](LogAgg.read(plain))
  }

  test("create validates keys/counters against the schema") {
    intercept[IllegalArgumentException](
      LogAgg.create(spark, scratch("la_bad"), schema, Seq("k"), Seq("missing")))
  }
}
