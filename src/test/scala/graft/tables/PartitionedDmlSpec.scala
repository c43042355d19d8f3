package graft.tables

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.tables.MergeOps._

/** DML on Hive-partitioned tables: partition values live in the k=v dir
  * names, so every rewrite path must read with basePath or the partition
  * column silently resolves to null (and rows land in
  * __HIVE_DEFAULT_PARTITION__). */
class PartitionedDmlSpec extends SparkTestBase {

  private def nation = Tables.t(spark, sf, "nation")

  private def mkPartitioned(tag: String): GraftTable = {
    val t = GraftTable.create(spark, scratch(tag), nation.schema,
      Map("graft.partitionBy" -> "n_regionkey"))
    t.append(nation)
    t
  }

  test("merge on a partitioned table preserves partition values") {
    val t = mkPartitioned("pmerge")
    val source = nation.filter(col("n_regionkey") === 2)
      .withColumn("n_name", lit("updated"))
    MergeOps.mergeInto(t, source, "target.n_nationkey = source.n_nationkey",
      matched = Seq(WhenMatched(None, UpdateAll)))
    val after = t.read()
    assert(after.filter(col("n_regionkey").isNull).count() === 0)
    assert(after.filter(col("n_name") === "updated").count() ===
      nation.filter(col("n_regionkey") === 2).count())
    // untouched partitions intact
    assert(after.count() === nation.count())
    assert(after.select("n_regionkey").distinct().count() ===
      nation.select("n_regionkey").distinct().count())
  }

  test("merge predicate on the partition column matches rows") {
    val t = mkPartitioned("pmerge2")
    val source = nation.select("n_nationkey", "n_regionkey")
    // condition references the partition column on the target side
    val c = MergeOps.mergeInto(t, source,
      "target.n_nationkey = source.n_nationkey AND target.n_regionkey = source.n_regionkey",
      matched = Seq(WhenMatched(None, UpdateSet(Map("n_name" -> "'m'")))))
    assert(t.read().filter(col("n_name") === "m").count() === nation.count())
    assert(c.metrics("numTargetFilesRemoved") > 0)
  }

  test("delete by partition-column predicate removes exactly that partition") {
    val t = mkPartitioned("pdel")
    MergeOps.delete(t, "n_regionkey = 1")
    val after = t.read()
    assert(after.filter(col("n_regionkey") === 1).count() === 0)
    assert(after.count() === nation.filter(col("n_regionkey") =!= 1).count())
    assert(after.filter(col("n_regionkey").isNull).count() === 0)
  }

  test("update on a partitioned table keeps rows in their partitions") {
    val t = mkPartitioned("pupd")
    MergeOps.update(t, Map("n_name" -> "'x'"), "n_regionkey = 3")
    val after = t.read()
    assert(after.filter(col("n_name") === "x").count() ===
      nation.filter(col("n_regionkey") === 3).count())
    assert(after.filter(col("n_regionkey").isNull).count() === 0)
    assert(after.count() === nation.count())
  }

  test("CDF rows from partitioned-table DML carry partition values") {
    val t = GraftTable.create(spark, scratch("pcdf"), nation.schema,
      Map("graft.partitionBy" -> "n_regionkey",
        "graft.enableChangeDataFeed" -> "true"))
    t.append(nation)
    MergeOps.delete(t, "n_regionkey = 4")
    val ch = t.changes(0).filter(col("_change_type") === "delete")
    assert(ch.count() === nation.filter(col("n_regionkey") === 4).count())
    assert(ch.filter(col("n_regionkey").isNull).count() === 0)
  }
}
