package graft.perf

import graft.SparkTestBase

/** Lineage.cut durability dispatch: local blocks by default, a RELIABLE
  * checkpoint (survives executor loss) once the session has a checkpoint
  * dir configured — the production setting for iterative jobs. Chain
  * bounds an iterative loop's checkpoint-dir usage at O(1) by deleting
  * each superseded round.
  *
  * `Dataset.rdd` re-derives a fresh RDD from the plan, so the assertions
  * use observable effects: the truncated plan (a LogicalRDD scan with no
  * upstream operators) and, for the reliable path, files landing in the
  * configured checkpoint directory. */
class LineageSpec extends SparkTestBase {
  import spark.implicits._

  private def isTruncated(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().size == 1 &&
      df.queryExecution.optimizedPlan.getClass.getSimpleName == "LogicalRDD"

  /** rdd-N checkpoint dirs below `dir` (one per surviving cut). The walk
    * stream holds a directory handle and must be closed. */
  private def checkpointDirs(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("rdd-"))
      .map(_.toString).toList
    finally s.close()
  }

  test("cut truncates lineage locally when no checkpoint dir is configured") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val cut = Lineage.cut(Seq(1, 2, 3).toDF("x").filter($"x" > 1))
    assert(isTruncated(cut), cut.queryExecution.optimizedPlan.toString)
    assert(cut.as[Int].collect().sorted.toSeq === Seq(2, 3))
  }

  test("cut upgrades to a reliable checkpoint when a dir is configured") {
    val dir = scratch("ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val cut = Lineage.cut(Seq(4, 5).toDF("x"))
      assert(isTruncated(cut), cut.queryExecution.optimizedPlan.toString)
      assert(checkpointDirs(dir).nonEmpty,
        "configured dir must receive reliable checkpoint files")
      assert(cut.as[Int].collect().sorted.toSeq === Seq(4, 5))
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("Chain deletes superseded round checkpoints, keeps the latest") {
    val dir = scratch("ckptchain")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val chain = new Lineage.Chain
      var cur = chain.cut(Seq(1, 2, 3).toDF("x"))
      (1 to 3).foreach { _ =>
        cur = chain.cut(cur.withColumn("x", $"x" + 1))
      }
      // 4 cuts ran; only the latest round's rdd-checkpoint dir survives
      assert(checkpointDirs(dir).size == 1,
        s"superseded rounds must be deleted: ${checkpointDirs(dir)}")
      assert(cur.as[Int].collect().sorted.toSeq === Seq(4, 5, 6))
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
