package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry, Tables}

/** Per-gate cost attribution (guide §1: decide whether the wall goes to
  * executor compute, shuffle, or driver/scheduling) without the UI: a
  * SparkListener accumulates, per catalogued query, the number of jobs /
  * stages / tasks, the summed executor run time, GC time, and shuffle
  * read/write bytes. `wall ≫ Σtask/cores` means driver- or
  * scheduling-bound (too many tiny actions); `Σtask ≈ wall × cores`
  * means genuinely compute-bound inside tasks.
  *
  * Usage: runMain graft.tools.ProfJobs <sfDir> <name1,name2,...|top> [reps]
  */
object ProfJobs {

  private final class Acc {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val runMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val resultSerMs = new AtomicLong
    val deserMs = new AtomicLong
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0); gcMs.set(0)
      shufReadB.set(0); shufWriteB.set(0); resultSerMs.set(0); deserMs.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfJobs <sfDir> <names|all> [reps]")
    val sfDir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val names =
      if (args(1) == "all") qs.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val perJob = sys.env.get("PROFJOBS_PER_JOB").exists(_ == "1")
    val acc = new Acc
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        acc.jobs.incrementAndGet()
        if (perJob) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
          jobT0.put(j.jobId, (System.nanoTime(), desc.take(140)))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (perJob) {
        Option(jobT0.remove(j.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 40) println(f"[profjob]   job ${j.jobId}%4d ${ms / 1e3}%6.2fs  $desc")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        acc.stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        acc.tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          acc.runMs.addAndGet(m.executorRunTime)
          acc.gcMs.addAndGet(m.jvmGCTime)
          acc.shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          acc.shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          acc.resultSerMs.addAndGet(m.resultSerializationTime)
          acc.deserMs.addAndGet(m.executorDeserializeTime)
        }
      }
    })

    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count()) // warm
    println("[profjobs] name rep wall_s jobs stages tasks task_s gc_s " +
      "shuf_read_mb shuf_write_mb deser_s")
    for (n <- names; rep <- 1 to reps) {
      Harness.resetRunState(spark, gc = true)
      // let the listener queue drain from the reset before zeroing
      // (listenerBus is private[spark]; a short sleep suffices here)
      Thread.sleep(300)
      acc.reset()
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[profjobs] $n $rep $wall%.2f ${acc.jobs.get} ${acc.stages.get} " +
        f"${acc.tasks.get} ${acc.runMs.get / 1e3}%.2f ${acc.gcMs.get / 1e3}%.2f " +
        f"${acc.shufReadB.get / 1e6}%.1f ${acc.shufWriteB.get / 1e6}%.1f " +
        f"${acc.deserMs.get / 1e3}%.2f")
    }
    spark.stop()
  }
}
