package graft.tables

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Commit-log caching + checkpointing: after warm-up, table operations do
  * zero physical log reads; a cold start reads checkpoint + tail instead
  * of every v*.json. */
class CommitLogCacheSpec extends SparkTestBase {

  test("warm metadata ops do no log-file reads; cold start reads ckpt + tail") {
    val region = Tables.t(spark, sf, "region")
    val t = GraftTable.createFrom(spark, scratch("logcache"), region)
    // 120 metadata-only commits (append-only log; checkpoints every 10)
    (1 to 120).foreach(i => t.setProperties(Map("k" -> i.toString)))
    val nVersions = t.currentVersion
    assert(nVersions === 121L)

    val filesWarm = t.filesAt()
    val before = GraftTable.logFileReads.get()
    (1 to 10).foreach { _ =>
      t.filesAt(); t.schemaAt(); t.properties; t.history.count(); t.currentVersion
    }
    assert(GraftTable.logFileReads.get() === before, "warm ops must not re-read the log")

    // cold start (fresh JVM simulation): checkpoint + tail, not O(versions)
    GraftTable.clearLogCache(t.path)
    val coldBefore = GraftTable.logFileReads.get()
    val t2 = GraftTable.load(spark, t.path)
    val filesCold = t2.filesAt()
    val coldReads = GraftTable.logFileReads.get() - coldBefore
    assert(coldReads <= 12, s"cold start read $coldReads log files (expected ckpt + tail)")
    assert(filesCold === filesWarm)
    assert(t2.properties("k") === "120")

    // time travel still resolves through the cache
    assert(t2.schemaAt(0).fieldNames.toSeq === region.schema.fieldNames.toSeq)
    assert(t2.commitAt(60).operation === "SET TBLPROPERTIES")
  }

  test("a concurrent writer's new commits are picked up incrementally") {
    val region = Tables.t(spark, sf, "region")
    val t = GraftTable.createFrom(spark, scratch("logcache2"), region)
    t.commits // warm the cache
    // second instance (same cache key) appends
    val t2 = GraftTable.load(spark, t.path)
    t2.setProperties(Map("x" -> "1"))
    assert(t.currentVersion === 2L)
    assert(t.properties("x") === "1")
  }

  test("deleteTree evicts caches: a recreate at the same path serves fresh stats") {
    val path = scratch("recreate")
    val nation = Tables.t(spark, sf, "nation")
    val t1 = GraftTable.createFrom(spark, path, nation.filter(col("n_nationkey") < 10))
    // warm the stats cache through the pruning path
    assert(t1.readWhere("n_nationkey = 5").count() === 1L)
    GraftTable.deleteTree(java.nio.file.Paths.get(path))
    // same path, same commit sequence (=> same tip version), DISJOINT key
    // range: a stale cached stats map would prune key 12 away entirely and
    // claim files for key 5
    val t2 = GraftTable.createFrom(spark, path, nation.filter(col("n_nationkey") >= 10))
    assert(t2.readWhere("n_nationkey = 5").count() === 0L)
    assert(t2.readWhere("n_nationkey = 12").count() === 1L)
  }

  test("identity assignment stays dense across appends (footer-count path)") {
    val full = Tables.t(spark, sf, "customer")
    val cust = full.limit(100).drop("c_custkey")
    val t = GraftTable.create(spark, scratch("ident"), full.schema,
      Map("graft.identity.column" -> "c_custkey"))
    t.append(cust)
    t.append(cust)
    val ids = t.read().select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (1L to 200L))
    assert(t.identityHighWatermark === 200L)
  }
}
