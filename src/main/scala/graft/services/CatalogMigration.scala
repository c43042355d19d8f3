package graft.services

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame

import graft.sql.GraftSql
import graft.tables.GraftTable

/** Bulk catalog upgrade sweep — the HMS→UC migration pattern
  * (`10-migrations/05-uc-upgrade/00-Upgrade-database-to-UC.sql:135-202`):
  * iterate every table of a source catalog, clone it into the target
  * namespace (SYNC/deep-clone analog), register it there, and emit the
  * follow-up GRANT statements the reference generates per table (ACL
  * application itself is out of engine scope — GRANT is a routed no-op).
  *
  * Returns one row per table: (table, mode, files, grant_sql). Clones are
  * `shallow` (metadata-only, zero copy — the default for big tables) or
  * `deep` (physical copy). */
object CatalogMigration {

  final case class Migrated(table: String, mode: String, files: Long, grantSql: String)

  def upgrade(
      source: GraftSql,
      target: GraftSql,
      principal: String = "account users",
      deepCopy: Boolean = false): Seq[Migrated] = {
    val mode = if (deepCopy) "deep" else "shallow"
    val out = source.tableNames.map { name =>
      val src = source.table(name)
      val destPath = Paths.get(target.basePath, name).toString
      val cloned =
        if (deepCopy) src.cloneTo(destPath) else src.shallowCloneTo(destPath)
      target.register(name, cloned)
      val grant = s"GRANT SELECT ON TABLE $name TO `$principal`"
      target.sql(grant) // routed ACL no-op, as in the reference's sweep
      Migrated(name, mode, cloned.filesAt().size.toLong, grant)
    }
    out
  }

  def reportDF(g: GraftSql, rows: Seq[Migrated]): DataFrame = {
    import g.spark.implicits._
    rows.toDF("table", "mode", "files", "grant_sql")
  }
}
