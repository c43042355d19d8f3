package graft.tables

import java.nio.file.{Files, Paths}

import graft.{SparkTestBase, Tables}

/** TIMESTAMP AS OF resolution: at-or-before flooring, boundary errors,
  * and the running-max monotonization that keeps the index well-defined
  * when racing writers' clocks disagree. */
class TimeTravelSpec extends SparkTestBase {

  private def customer = Tables.t(spark, sf, "customer")

  test("versionAtTimestamp floors between commits; boundaries behave like Delta") {
    val t = GraftTable.createFrom(spark, scratch("ts-floor"), customer.limit(10))
    Thread.sleep(5)
    t.append(customer.limit(5)) // v2
    val ts1 = t.commitAt(1).timestampMs
    val ts2 = t.commitAt(2).timestampMs
    assert(t.versionAtTimestamp(ts1) === 1)
    if (ts2 > ts1 + 1) assert(t.versionAtTimestamp(ts2 - 1) === 1)
    assert(t.versionAtTimestamp(ts2) === 2)
    // after the last commit → latest; before the first → error
    assert(t.versionAtTimestamp(ts2 + 3600 * 1000) === 2)
    intercept[IllegalArgumentException](
      t.versionAtTimestamp(t.commitAt(0).timestampMs - 10))
    // the read resolves to the same content as the version read
    assert(t.readAsOfTimestamp(ts1).count() === t.read(versionAsOf = 1).count())
  }

  test("versionAtTimestamp monotonizes clock-skewed commit stamps") {
    val t = GraftTable.createFrom(spark, scratch("ts-skew"), customer.limit(10))
    t.append(customer.limit(5)) // v2
    // fabricate skew: v1's writer clock ran ahead of v2's
    val ts2 = t.commitAt(2).timestampMs
    val v1 = Paths.get(t.path, "_log").resolve(f"v${1L}%020d.json")
    val c1 = GraftTable.parseCommit(new String(Files.readAllBytes(v1), "UTF-8"))
    Files.write(v1,
      GraftTable.renderCommit(c1.copy(timestampMs = ts2 + 1000)).getBytes("UTF-8"))
    GraftTable.clearLogCache(t.path)
    // effective stamps are a running max, so v2 is reachable at v1's
    // (skewed) stamp and beyond — never shadowed by its older raw stamp
    assert(t.versionAtTimestamp(ts2 + 1000) === 2)
    assert(t.versionAtTimestamp(ts2 + 2000) === 2)
    // below the skewed stamp the floor falls back to the create commit
    assert(t.versionAtTimestamp(ts2 + 999) === 0)
  }

  test("restoreToTimestamp repoints through the same resolver") {
    val t = GraftTable.createFrom(spark, scratch("ts-restore"), customer.limit(10))
    val n1 = t.read().count()
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(customer.limit(5))
    assert(t.read().count() === n1 + 5)
    t.restoreToTimestamp(mid)
    assert(t.read().count() === n1)
  }
}
