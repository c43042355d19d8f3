package graft.services

import graft.{SparkTestBase, Tables}
import graft.sql.GraftSql

class StatementLifecycleSpec extends SparkTestBase {

  private def mkSql(tag: String): GraftSql = {
    val g = new GraftSql(spark, scratch(tag))
    g.createTable("r", Tables.t(spark, sf, "region").schema)
    g.sql(s"COPY INTO r FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    g
  }

  test("statement runs PENDING/RUNNING to SUCCEEDED; chunks reassemble") {
    val lc = new StatementLifecycle(mkSql("lc1"), chunkSize = 2)
    val id = lc.submit("SELECT r_regionkey, r_name FROM r ORDER BY r_regionkey")
    assert(lc.await(id) === "SUCCEEDED")
    assert(lc.columnNames(id) === Seq("r_regionkey", "r_name"))
    // 5 rows at chunkSize 2 → chunks 0,1,2 with next pointers 1,2,None
    val c0 = lc.chunk(id, 0)
    assert(c0.rowCount === 2 && c0.nextChunkIndex === Some(1))
    val c2 = lc.chunk(id, 2)
    assert(c2.rowCount === 1 && c2.nextChunkIndex === None)
    val all = lc.assemble(id)
    assert(all.size === 5)
    assert(all.map(_.head) === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("failed statement reports FAILED with an error message") {
    val lc = new StatementLifecycle(mkSql("lc2"))
    val id = lc.submit("SELECT * FROM no_such_table_anywhere")
    assert(lc.await(id) === "FAILED")
    assert(lc.errorMessage(id).isDefined)
    intercept[IllegalArgumentException](lc.chunk(id, 0))
  }

  test("cancel wins against a running statement; finished ones refuse") {
    val lc = new StatementLifecycle(mkSql("lc3"))
    val slow = lc.submitBody { () => Thread.sleep(60000); (Nil, Vector.empty) }
    // let it enter RUNNING
    Thread.sleep(100)
    assert(lc.cancel(slow))
    assert(lc.await(slow, timeoutMs = 5000) === "CANCELED")
    val quick = lc.submit("SELECT count(*) AS n FROM r")
    assert(lc.await(quick) === "SUCCEEDED")
    assert(!lc.cancel(quick)) // already finished
    assert(lc.status(quick) === "SUCCEEDED")
  }

  test("a successful cancel() never ends SUCCEEDED, at any race timing") {
    val lc = new StatementLifecycle(mkSql("lc4"))
    // hammer the submit/cancel window: with the old unconditional
    // state=Running transition, a cancel landing between dequeue and the
    // transition was overwritten and the statement finished SUCCEEDED
    (1 to 200).foreach { i =>
      val id = lc.submitBody(() => (Seq("x"), Vector(Seq(i))))
      val canceled = lc.cancel(id)
      val terminal = lc.await(id, timeoutMs = 5000)
      if (canceled)
        assert(terminal === "CANCELED", s"iteration $i: cancel() returned " +
          s"true but the statement ended $terminal")
      else assert(terminal === "SUCCEEDED")
    }
  }

  test("a body that swallows the interrupt still ends CANCELED") {
    val lc = new StatementLifecycle(mkSql("lc5"))
    val started = new java.util.concurrent.CountDownLatch(1)
    val id = lc.submitBody { () =>
      started.countDown()
      try Thread.sleep(60000)
      catch { case _: InterruptedException => /* swallowed */ }
      (Seq("x"), Vector(Seq(1)))
    }
    started.await()
    assert(lc.cancel(id))
    assert(lc.await(id, timeoutMs = 5000) === "CANCELED")
  }
}
