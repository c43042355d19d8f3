package graft.tables

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.tables.MergeOps._

class MergeOpsSpec extends SparkTestBase {

  private def customer = Tables.t(spark, sf, "customer")

  test("merge rewrites only files containing matched rows") {
    // 5 files; source touches keys in one partition range only
    val t = GraftTable.create(spark, scratch("prune"), customer.schema)
    val parts = customer.repartitionByRange(5, col("c_custkey"))
    t.append(parts)
    val filesBefore = t.filesAt().size
    assert(filesBefore >= 5)
    val source = customer.filter(col("c_custkey") <= 10)
      .withColumn("c_acctbal", lit(0.0))
    val c = MergeOps.mergeInto(t, source, "target.c_custkey = source.c_custkey",
      matched = Seq(WhenMatched(None, UpdateAll)))
    // only the file(s) holding keys 1..10 were rewritten
    assert(c.metrics("numTargetFilesRemoved") < filesBefore)
    assert(t.read().filter(col("c_acctbal") === 0.0).count() ===
      customer.filter(col("c_custkey") <= 10).count())
    assert(t.read().count() === customer.count())
  }

  test("merge discovery scan is stats-pruned to range-overlapping files") {
    val t = GraftTable.create(spark, scratch("statprune"), customer.schema)
    t.append(customer.repartitionByRange(8, col("c_custkey")))
    val total = t.filesAt().size
    assert(total >= 8)
    val source = customer.filter(col("c_custkey").between(5, 15))
      .withColumn("c_acctbal", lit(-1.0))
    val c = MergeOps.mergeInto(t, source, "target.c_custkey = source.c_custkey",
      matched = Seq(WhenMatched(None, UpdateAll)))
    // the semi-join read only files whose [min,max] overlaps keys 5..15
    assert(c.metrics("numCandidateFiles") < total.toLong)
    assert(c.metrics("numCandidateFiles") >= c.metrics("numTargetFilesRemoved"))
    assert(t.read().filter(col("c_acctbal") === -1.0).count() === 11)
    assert(t.read().count() === customer.count())
  }

  test("empty merge source touches nothing") {
    val t = GraftTable.createFrom(spark, scratch("emptysrc"), customer.limit(50))
    val c = MergeOps.mergeInto(t, customer.filter(lit(false)),
      "target.c_custkey = source.c_custkey",
      matched = Seq(WhenMatched(None, UpdateAll)),
      notMatched = Seq(WhenNotMatched(None, InsertAll)))
    assert(c.metrics("numTargetFilesRemoved") === 0L)
    assert(t.read().count() === 50)
  }

  test("conditional update with extra predicate leaves other rows alone") {
    val t = GraftTable.createFrom(spark, scratch("cond"), customer)
    MergeOps.mergeInto(t, customer, "target.c_custkey = source.c_custkey",
      matched = Seq(WhenMatched(Some("target.c_acctbal < 0"),
        UpdateSet(Map("c_acctbal" -> "0.0")))))
    assert(t.read().filter(col("c_acctbal") < 0).count() === 0)
    val untouched = customer.filter(col("c_acctbal") >= 0).count()
    assert(t.read().filter(col("c_acctbal") >= 0).count() >= untouched)
  }

  test("insert-only merge suppresses already-present keys") {
    val t = GraftTable.createFrom(spark, scratch("insonly"), customer.limit(100))
    MergeOps.mergeInto(t, customer, "target.c_custkey = source.c_custkey",
      matched = Nil,
      notMatched = Seq(WhenNotMatched(None, InsertAll)))
    assert(t.read().count() === customer.count()) // no duplicates
    assert(t.read().select("c_custkey").distinct().count() === customer.count())
  }

  test("multiple source matches raise MultipleMatchException") {
    val t = GraftTable.createFrom(spark, scratch("multi"), customer.limit(20))
    intercept[MultipleMatchException] {
      MergeOps.mergeInto(t, customer.limit(20).union(customer.limit(20)),
        "target.c_custkey = source.c_custkey",
        matched = Seq(WhenMatched(None, UpdateAll)))
    }
  }

  test("merge emits update_postimage/insert/delete change-feed rows") {
    val t = GraftTable.createFrom(spark, scratch("mcdf"), customer.limit(10),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val source = customer.limit(12) // 10 matched + 2 new
      .withColumn("c_acctbal", col("c_acctbal") + 1)
    MergeOps.mergeInto(t, source, "target.c_custkey = source.c_custkey",
      matched = Seq(
        WhenMatched(Some("target.c_custkey = 0"), DeleteAction),
        WhenMatched(None, UpdateAll)),
      notMatched = Seq(WhenNotMatched(None, InsertAll)))
    val byType = t.changes(fromVersion = 2)
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 1L, "update_postimage" -> 9L, "insert" -> 2L))
  }

  test("delete with no matching rows is a metadata-only commit") {
    val t = GraftTable.createFrom(spark, scratch("nodel"), customer)
    val files = t.filesAt()
    MergeOps.delete(t, "c_custkey < 0")
    assert(t.filesAt() === files) // nothing rewritten
    assert(t.read().count() === customer.count())
  }

  test("update applies expression only where predicate holds") {
    val t = GraftTable.createFrom(spark, scratch("upd"), customer)
    MergeOps.update(t, Map("c_mktsegment" -> "'VIP'"), "c_acctbal > 9000")
    val vip = t.read().filter(col("c_mktsegment") === "VIP").count()
    assert(vip === customer.filter(col("c_acctbal") > 9000).count())
  }
}
