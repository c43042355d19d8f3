package graft.tables

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Merge-on-read deletes (deletion vectors): DELETE writes a (file, pos)
  * sidecar, no data file is rewritten, reads/time-travel/restore apply
  * the right DV state, OPTIMIZE materializes and clears. */
class DeletionVectorSpec extends SparkTestBase {

  private def lineitem = Tables.t(spark, sf, "lineitem").limit(2000)

  private def mkDv(tag: String, cdf: Boolean = false): GraftTable = {
    val props = Map("graft.deletionVectors" -> "true") ++
      (if (cdf) Map("graft.enableChangeDataFeed" -> "true") else Map.empty)
    val t = GraftTable.create(spark, scratch(tag), lineitem.schema, props)
    t.append(lineitem.repartition(4))
    t
  }

  test("DV delete rewrites no files and hides exactly the matched rows") {
    val t = mkDv("dv1")
    val before = t.filesAt()
    val expect = lineitem.filter(col("l_quantity") <= 45).count()
    val c = MergeOps.delete(t, "l_quantity > 45")
    assert(t.filesAt() === before, "DV delete must not rewrite data files")
    assert(c.addedFiles.isEmpty && c.removedFiles.isEmpty)
    assert(c.addedDvFiles.nonEmpty)
    assert(t.read().count() === expect)
    assert(t.read().filter(col("l_quantity") > 45).count() === 0)
  }

  test("successive DV deletes accumulate without double-counting") {
    val t = mkDv("dv2")
    MergeOps.delete(t, "l_quantity > 45")
    val n1 = t.read().count()
    // overlapping predicate: already-deleted rows must not re-enter the DV
    val c2 = MergeOps.delete(t, "l_quantity > 40")
    val expect = lineitem.filter(col("l_quantity") <= 40).count()
    assert(t.read().count() === expect)
    assert(c2.metrics("numDeletedRows") ===
      lineitem.filter(col("l_quantity") > 40 && col("l_quantity") <= 45).count())
    assert(n1 > expect)
  }

  test("time travel and RESTORE apply per-version DV state") {
    val t = mkDv("dv3")
    val v0 = t.currentVersion
    val total = lineitem.count()
    MergeOps.delete(t, "l_quantity > 45")
    val v1 = t.currentVersion
    MergeOps.delete(t, "l_returnflag = 'R'")
    assert(t.read(v0).count() === total)
    assert(t.read(v1).count() === lineitem.filter(col("l_quantity") <= 45).count())
    t.restoreTo(v0)
    assert(t.read().count() === total)
  }

  test("CDF emits the newly deleted rows only") {
    val t = mkDv("dv4", cdf = true)
    MergeOps.delete(t, "l_quantity > 45")
    val v1 = t.currentVersion
    MergeOps.delete(t, "l_quantity > 40")
    val ch = t.changes(v1 + 1).filter(col("_change_type") === "delete")
    assert(ch.count() ===
      lineitem.filter(col("l_quantity") > 40 && col("l_quantity") <= 45).count())
  }

  test("OPTIMIZE materializes deletes and clears the DV set") {
    val t = mkDv("dv5")
    MergeOps.delete(t, "l_quantity > 45")
    val expect = lineitem.filter(col("l_quantity") <= 45).count()
    Maintenance.optimize(t)
    assert(t.dvAt().isEmpty)
    assert(t.read().count() === expect)
    // vacuum with zero retention now drops the orphaned DV sidecars
    val deleted = t.vacuum(0)
    assert(deleted.exists(_.contains("/dv/")))
    assert(t.read().count() === expect)
  }

  test("clones of a DV table materialize the deletes") {
    val t = mkDv("dv6")
    MergeOps.delete(t, "l_quantity > 45")
    val expect = t.read().count()
    val shallow = t.shallowCloneTo(scratch("dv6s"))
    assert(shallow.read().count() === expect)
    assert(shallow.dvAt().isEmpty)
    val deep = t.cloneTo(scratch("dv6d"))
    assert(deep.read().count() === expect)
  }

  test("overwrite drops live DV sidecars with the data files") {
    val t = mkDv("dv8")
    MergeOps.delete(t, "l_quantity > 45")
    assert(t.dvAt().nonEmpty)
    t.overwrite(lineitem.limit(100))
    assert(t.dvAt().isEmpty, "stale DVs must not survive an overwrite")
    assert(t.read().count() === 100)
    // with no version retention the orphaned sidecars are reclaimable
    val deleted = t.vacuum(0)
    assert(deleted.exists(_.contains("/dv/")))
  }

  test("MERGE and UPDATE on a DV table see only live rows") {
    val t = mkDv("dv7")
    MergeOps.delete(t, "l_quantity > 45")
    MergeOps.update(t, Map("l_tax" -> "9.0"), "l_quantity > 40")
    val updated = t.read().filter(col("l_tax") === 9.0).count()
    assert(updated ===
      lineitem.filter(col("l_quantity") > 40 && col("l_quantity") <= 45).count())
    assert(t.read().filter(col("l_quantity") > 45).count() === 0)
  }
}
