package graft.services

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query replay + concurrency harness (`REPLAY/00-Functions.py:158-438`,
  * `databricks-concurrency/01-concurrency-testing-notebook.py`): re-issue a
  * recorded workload preserving original inter-arrival offsets (optionally
  * time-compressed), or hammer a query set with N concurrent workers, and
  * report per-query durations for source-vs-target comparison.
  *
  * The reference crosses a REST boundary to a warehouse; here the
  * "warehouse" is the local SparkSession and the thread pool plays the
  * sender pool. Per-query results join back to the schedule exactly like
  * the reference's window-normalized comparison.
  */
object QueryReplay {

  final case class ReplayRecord(queryId: String, sql: String, startOffsetMs: Long)
  final case class ReplayResult(queryId: String, scheduledOffsetMs: Long,
      durationMs: Long, rows: Long, status: String)

  /** Replay `records` at their original offsets (divided by `speedup`). */
  def replay(spark: SparkSession, records: Seq[ReplayRecord],
      speedup: Double = 1.0, parallelism: Int = 8): Seq[ReplayResult] = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = records.map { r =>
      Future {
        val target = (r.startOffsetMs / speedup).toLong
        val elapsed = (System.nanoTime() - t0) / 1000000
        if (target > elapsed) Thread.sleep(target - elapsed)
        val qs = System.nanoTime()
        val res = Try(spark.sql(r.sql).count())
        val dur = (System.nanoTime() - qs) / 1000000
        ReplayResult(r.queryId, target, dur,
          res.getOrElse(-1L), if (res.isSuccess) "FINISHED" else "FAILED")
      }
    }
    try Await.result(Future.sequence(futures), 10.minutes)
    finally pool.shutdown()
  }

  final case class ConcurrencyReport(nQueries: Int, concurrency: Int,
      totalSec: Double, qpm: Double, avgMs: Double, maxMs: Long)

  /** Concurrency test: run the query set `repeat` times across `concurrency`
    * workers; QPM = queries·repeat / minutes (the reference's throughput
    * metric, cache off). */
  def concurrencyTest(spark: SparkSession, queries: Seq[String],
      concurrency: Int, repeat: Int = 1): ConcurrencyReport = {
    val pool = Executors.newFixedThreadPool(concurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val work = (1 to repeat).flatMap(_ => queries)
    val t0 = System.nanoTime()
    val durs = Await.result(Future.sequence(work.map(q => Future {
      val s = System.nanoTime()
      Try(spark.sql(q).count())
      (System.nanoTime() - s) / 1000000
    })), 30.minutes)
    pool.shutdown()
    val totalSec = (System.nanoTime() - t0) / 1e9
    ConcurrencyReport(work.size, concurrency, totalSec,
      work.size * 60.0 / totalSec,
      durs.sum.toDouble / durs.size, durs.max)
  }

  def resultsDF(spark: SparkSession, rs: Seq[ReplayResult]): DataFrame = {
    import spark.implicits._
    rs.toDF()
  }
}
