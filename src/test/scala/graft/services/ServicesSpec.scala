package graft.services

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.sql.GraftSql

class ServicesSpec extends SparkTestBase {

  test("validator finds exact mismatched rows") {
    val a = Tables.t(spark, sf, "customer")
    val b = a.withColumn("c_acctbal",
      when(col("c_custkey") <= 3, col("c_acctbal") + 1).otherwise(col("c_acctbal")))
    val bad = DataValidator.mismatchedRows(a, b)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(bad.toSeq === Seq(0L, 1L, 2L, 3L)) // custkeys start at 0
    val rep = DataValidator.compare(a, b)
    assert(rep.onlyInA === 4 && rep.onlyInB === 4)
    assert(rep.matched === a.count() - 4)
  }

  test("transaction alteredTables infers targets across statement kinds") {
    val g = new GraftSql(spark, scratch("ti"))
    g.createTable("t1", Tables.t(spark, sf, "part").schema)
    g.createTable("t2", Tables.t(spark, sf, "part").schema)
    val txn = new Transaction(g)
    assert(txn.alteredTables("DELETE FROM t1 WHERE x = 1") === Seq("t1"))
    assert(txn.alteredTables("UPDATE t2 SET a = 1") === Seq("t2"))
    assert(txn.alteredTables("MERGE INTO t1 USING v ON 1=1 WHEN MATCHED THEN DELETE") === Seq("t1"))
    assert(txn.alteredTables("OPTIMIZE t2 ZORDER BY (a)") === Seq("t2"))
    assert(txn.alteredTables("SELECT * FROM t1") === Nil)
    assert(txn.alteredTables("INSERT INTO t1 SELECT * FROM t2") === Seq("t1"))
  }

  test("programmatic transaction restores declared tables on failure") {
    val g = new GraftSql(spark, scratch("pt"))
    g.createTable("t", Tables.t(spark, sf, "part").schema)
    g.sql(s"COPY INTO t FROM '$sf/part.parquet' FILEFORMAT = PARQUET")
    val before = g.table("t").read().count()
    val txn = new Transaction(g)
    intercept[Transaction.RolledBackException] {
      txn.execute(Seq("t")) {
        graft.tables.MergeOps.delete(g.table("t"), "p_size > 0")
        sys.error("midway failure")
      }
    }
    assert(g.table("t").read().count() === before)
  }
}
