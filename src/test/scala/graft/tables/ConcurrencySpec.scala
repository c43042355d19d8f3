package graft.tables

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkTestBase

/** Optimistic concurrency: the commit is an atomic no-replace rename, the
  * loser of a version race throws ConcurrentCommitException, and
  * `Concurrency.retry` re-drives it on a fresh snapshot — the engine's
  * answer to the reference's retry-merge helper
  * (`HF/deltahelpers.py:132-172`). */
class ConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("8 racing writers all land; versions stay contiguous") {
    val path = scratch("race")
    val schema = Seq((0L, "seed")).toDF("id", "tag").schema
    GraftTable.create(spark, path, schema)

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writes = (1 to 8).map { i =>
      Future {
        val t = GraftTable.load(spark, path) // independent writer handle
        Concurrency.retry(maxTries = 10) {
          t.append(Seq((i.toLong, s"w$i")).toDF("id", "tag"))
        }
      }
    }
    Await.result(Future.sequence(writes), 5.minutes)
    pool.shutdown()

    val t = GraftTable.load(spark, path)
    val versions = t.commits.map(_.version)
    assert(versions === (0L to 8L), "versions must be contiguous, no gaps")
    assert(t.read().count() === 8L, "every racing append must be durable")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ===
      (1L to 8L), "no write lost or duplicated")
  }

}
