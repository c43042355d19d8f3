package graft.services

import graft.{SparkTestBase, Tables}
import graft.sql.GraftSql

class CatalogMigrationSpec extends SparkTestBase {

  test("upgrade sweep clones every table into the target catalog") {
    val src = new GraftSql(spark, scratch("mig-src"))
    src.createTable("r", Tables.t(spark, sf, "region").schema)
    src.sql(s"COPY INTO r FROM '$sf/region.parquet' FILEFORMAT = PARQUET")
    src.createTable("n", Tables.t(spark, sf, "nation").schema)
    src.sql(s"COPY INTO n FROM '$sf/nation.parquet' FILEFORMAT = PARQUET")

    val tgt = new GraftSql(spark, scratch("mig-tgt"))
    val rows = CatalogMigration.upgrade(src, tgt, principal = "analysts")
    assert(rows.map(_.table).sorted === Seq("n", "r"))
    assert(rows.forall(_.mode == "shallow"))
    assert(rows.forall(_.grantSql.contains("`analysts`")))
    // target reads equal source reads; source later writes are isolated
    assert(tgt.sql("SELECT count(*) AS c FROM r").head().getLong(0) === 5)
    src.sql("DELETE FROM n WHERE n_nationkey < 5")
    assert(tgt.sql("SELECT count(*) AS c FROM n").head().getLong(0) === 25)
  }
}
