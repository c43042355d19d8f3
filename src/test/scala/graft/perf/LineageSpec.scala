package graft.perf

import graft.SparkTestBase

/** Lineage.cut durability dispatch: local blocks by default, a RELIABLE
  * checkpoint (survives executor loss) once the session has a checkpoint
  * dir configured — the production setting for iterative jobs.
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
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "configured dir must receive reliable checkpoint files")
      assert(cut.as[Int].collect().sorted.toSeq === Seq(4, 5))
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
