package graft.services

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, Future => JFuture}

import scala.util.control.NonFatal

/** SQL statement execution lifecycle — the reference's SQL-over-REST
  * client/server state machine (`10-migrations/helperfunctions/
  * dbsqlclient.py:259-407`): submit → PENDING → RUNNING →
  * SUCCEEDED | FAILED | CANCELED, polling, cancellation, and chunked
  * result retrieval with ordered reassembly.
  *
  * The HTTP transport is out of scope in this offline environment; the
  * state machine, chunk paging (`chunk_index`/`next_chunk_index`), and
  * cancel semantics — the pure logic the reference implements client-side
  * — are real and tested. Statements execute asynchronously on a daemon
  * pool, exactly like a remote warehouse from the caller's view.
  */
final class StatementLifecycle(g: graft.sql.GraftSql, chunkSize: Int = 1000) {

  sealed abstract class State(val name: String)
  case object Pending extends State("PENDING")
  case object Running extends State("RUNNING")
  case object Succeeded extends State("SUCCEEDED")
  case object Failed extends State("FAILED")
  case object Canceled extends State("CANCELED")

  /** One result page: rows plus the index of the next page, if any. */
  final case class Chunk(chunkIndex: Int, rows: Seq[Seq[Any]],
      rowCount: Int, nextChunkIndex: Option[Int])

  private final class Entry {
    val state = new java.util.concurrent.atomic.AtomicReference[State](Pending)
    @volatile var rows: Vector[Seq[Any]] = Vector.empty
    @volatile var columns: Seq[String] = Nil
    @volatile var error: String = null
    @volatile var future: JFuture[_] = null
  }

  private val entries = new ConcurrentHashMap[String, Entry]()
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r); t.setDaemon(true); t
  })

  /** Submit a statement; returns immediately with the statement id. */
  def submit(sql: String): String =
    submitBody { () =>
      val df = g.sql(sql)
      (df.columns.toSeq, df.collect().toVector.map(_.toSeq))
    }

  /** Submit an arbitrary result-producing body (test seam / non-SQL work). */
  def submitBody(body: () => (Seq[String], Vector[Seq[Any]])): String = {
    val id = UUID.randomUUID().toString
    val e = new Entry
    entries.put(id, e)
    e.future = pool.submit(new Runnable {
      override def run(): Unit = {
        // CAS Pending→Running: a cancel that already landed (between
        // dequeue and here) must not be overwritten back to Running
        if (!e.state.compareAndSet(Pending, Running)) return
        try {
          val (cols, rows) = body()
          e.columns = cols
          e.rows = rows
          // a cancel that raced the finish wins, like the reference's API;
          // an interrupt the body swallowed counts as a cancel too
          if (Thread.interrupted()) e.state.compareAndSet(Running, Canceled)
          else e.state.compareAndSet(Running, Succeeded)
        } catch {
          case _: InterruptedException => e.state.set(Canceled)
          case NonFatal(ex) =>
            e.error = ex.getMessage
            // keep CANCELED sticky: interrupt-triggered secondary failures
            // (e.g. a closed channel) still report the cancel
            e.state.compareAndSet(Running, Failed)
            e.state.compareAndSet(Pending, Failed)
        }
      }
    })
    id
  }

  private def entry(id: String): Entry =
    Option(entries.get(id)).getOrElse(sys.error(s"unknown statement: $id"))

  def status(id: String): String = entry(id).state.get.name

  def errorMessage(id: String): Option[String] = Option(entry(id).error)

  /** Best-effort cancel; true when the statement ended CANCELED. */
  def cancel(id: String): Boolean = {
    val e = entry(id)
    while (true) {
      e.state.get match {
        case s @ (Pending | Running) =>
          if (e.state.compareAndSet(s, Canceled)) {
            Option(e.future).foreach(_.cancel(true))
            return true
          } // else: state moved under us — re-examine
        case Canceled => return true
        case _ => return false // already finished
      }
    }
    false // unreachable
  }

  /** Poll until terminal state (SUCCEEDED/FAILED/CANCELED) or timeout. */
  def await(id: String, timeoutMs: Long = 60000, pollMs: Long = 10): String = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var s = status(id)
    while ((s == "PENDING" || s == "RUNNING") && System.currentTimeMillis() < deadline) {
      Thread.sleep(pollMs)
      s = status(id)
    }
    s
  }

  def columnNames(id: String): Seq[String] = {
    require(status(id) == "SUCCEEDED", s"statement $id is ${status(id)}")
    entry(id).columns
  }

  /** Fetch one result page (the EXTERNAL_LINKS/INLINE chunk walk). */
  def chunk(id: String, chunkIndex: Int): Chunk = {
    require(status(id) == "SUCCEEDED", s"statement $id is ${status(id)}")
    val all = entry(id).rows
    val from = chunkIndex * chunkSize
    require(chunkIndex >= 0 && (from < all.size || all.isEmpty && chunkIndex == 0),
      s"chunk $chunkIndex out of range")
    val rows = all.slice(from, from + chunkSize)
    val next = if (from + chunkSize < all.size) Some(chunkIndex + 1) else None
    Chunk(chunkIndex, rows, rows.size, next)
  }

  /** Walk every chunk in order and reassemble the full result —
    * the reference's result-chunk assembly loop. */
  def assemble(id: String): Seq[Seq[Any]] = {
    val buf = Vector.newBuilder[Seq[Any]]
    var idx: Option[Int] = Some(0)
    while (idx.isDefined) {
      val c = chunk(id, idx.get)
      buf ++= c.rows
      idx = c.nextChunkIndex
    }
    buf.result()
  }
}
