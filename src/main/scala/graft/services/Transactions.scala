package graft.services

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}

import graft.sql.GraftSql
import graft.tables.GraftTable

/** Multi-statement transaction manager (`HF/transactions.py:304-540`):
  * snapshot the version of every table a statement chain will touch, run
  * the chain, and on failure RESTORE each table to its snapshot — the
  * reference's RESTORE-based rollback, on our commit log.
  *
  * Altered-table inference uses Spark's own parser (`CatalystSqlParser`
  * plan visit) instead of the reference's sqlglot regexes — exact, not
  * heuristic — plus the router's knowledge of engine statements (MERGE /
  * COPY / DELETE / UPDATE / OPTIMIZE / RESTORE / TRUNCATE / CTAS).
  */
final class Transaction(g: GraftSql) {

  private val snapshots = mutable.LinkedHashMap[String, Long]()

  /** Tables written by a statement (engine statements by router shape,
    * pass-through SQL by Catalyst plan inspection). */
  def alteredTables(statement: String): Seq[String] = {
    val s = statement.trim
    val u = s.toUpperCase
    val word: Int => Option[String] = i => s.split("\\s+").lift(i)
    val known = g.tableNames.toSet
    val fromRouter: Seq[String] =
      if (u.startsWith("COPY INTO") || u.startsWith("MERGE INTO")) word(2).toSeq
      else if (u.startsWith("DELETE FROM")) word(2).toSeq
      else if (u.startsWith("UPDATE ")) word(1).toSeq
      else if (u.startsWith("OPTIMIZE")) word(1).toSeq
      else if (u.startsWith("TRUNCATE")) s.split("\\s+").lastOption.toSeq
      else if (u.startsWith("RESTORE")) word(if (u.startsWith("RESTORE TABLE")) 2 else 1).toSeq
      else if (u.startsWith("CREATE")) "(?i)TABLE\\s+(\\w+)".r
        .findFirstMatchIn(s).map(_.group(1)).toSeq
      else {
        // pass-through SQL: exact plan visit (INSERT targets)
        try {
          val plan: LogicalPlan = g.spark.sessionState.sqlParser.parsePlan(s)
          plan.collect {
            case InsertIntoStatement(r: UnresolvedRelation, _, _, _, _, _, _) =>
              r.multipartIdentifier.last
          }
        } catch { case NonFatal(_) => Nil }
      }
    fromRouter.filter(known)
  }

  /** Execute a `;`-separated SQL chain transactionally: all statements run,
    * or every touched table is restored to its pre-chain version. */
  def executeSqlTransaction(chain: String): DataFrame = {
    val statements = graft.sql.SqlText.splitStatements(chain)
    statements.flatMap(alteredTables).distinct.foreach(snapshot)
    try {
      statements.map(g.sql).lastOption.getOrElse(
        g.spark.emptyDataFrame)
    } catch {
      case NonFatal(e) =>
        rollback()
        throw new Transaction.RolledBackException(
          s"transaction rolled back (${snapshots.keys.mkString(", ")})", e)
    }
  }

  /** Programmatic variant: declare tables up front, run any Scala body. */
  def execute[A](tables: Seq[String])(body: => A): A = {
    tables.foreach(snapshot)
    try body
    catch {
      case NonFatal(e) =>
        rollback()
        throw new Transaction.RolledBackException(
          s"transaction rolled back (${tables.mkString(", ")})", e)
    }
  }

  private def snapshot(name: String): Unit =
    if (!snapshots.contains(name))
      snapshots(name) = g.table(name).currentVersion

  private def rollback(): Unit =
    snapshots.foreach { case (name, v) =>
      val t = g.table(name)
      if (t.currentVersion != v) t.restoreTo(v)
    }
}

object Transaction {
  final class RolledBackException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
}
