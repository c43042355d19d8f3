package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.SaveMode

import graft.SparkTestBase

/** Round-1 tables wrote partitions in the bare Hive `k=v` layout, where
  * the partition column lives only in directory names, not in the parquet
  * data. The modern writer stores `__part_` column copies; this spec pins
  * the read-path fallback that keeps those legacy files readable (per
  * write-root partition inference) alongside modern files. */
class LegacyLayoutSpec extends SparkTestBase {

  import spark.implicits._

  private def legacyTable(tag: String): GraftTable = {
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "k", "v")
    val t = GraftTable.create(spark, scratch(tag), df.schema,
      Map("graft.partitionBy" -> "k"))
    // simulate the old writer: Hive layout, partition column consumed by
    // partitionBy (absent from the data files)
    val sub = "data/legacy0001"
    df.write.mode(SaveMode.Overwrite).partitionBy("k")
      .parquet(Paths.get(t.path, sub).toString)
    val rels = GraftTable.walkDir(Paths.get(t.path, sub))
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(t.path).relativize(p).toString).sorted
    t.commit("WRITE", rels, Nil, df.schema)
    t
  }

  test("legacy Hive-layout files read partition values via inference") {
    val t = legacyTable("legacy-read")
    val got = t.read().select("id", "k", "v").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)))
  }

  test("mixed legacy + modern files read consistently; DML works") {
    val t = legacyTable("legacy-mixed")
    t.append(Seq((4L, "b", 40), (5L, "c", 50)).toDF("id", "k", "v"))
    val got = t.read().select("id", "k").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c")))

    // DELETE crossing both cohorts: predicate on the partition column
    MergeOps.delete(t, "k = 'b'")
    val after = t.read().select("id").as[Long].collect().sorted.toSeq
    assert(after === Seq(1L, 2L, 5L))
    // deleted rows rewritten into the modern layout keep their k values
    val ks = t.read().select("k").as[String].collect().sorted.toSeq
    assert(ks === Seq("a", "a", "c"))
  }

  test("table rooted under a k=v directory keeps modern files modern") {
    // A table that happens to live at .../k=2020/tbl, with `k` also being
    // a partition column, must not misclassify modern files as legacy
    // (that would root basePath inference above the table and corrupt the
    // read partition values).
    val root = Paths.get(scratch("legacy-root"), "k=2020", "tbl").toString
    val df = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "k", "v")
    val t = GraftTable.create(spark, root, df.schema,
      Map("graft.partitionBy" -> "k"))
    t.append(df)
    val got = t.read().select("id", "k", "v").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10), (2L, "b", 20)))
  }

  test("stats pruning handles bare k=v segments") {
    val t = legacyTable("legacy-prune")
    val (kept, total) = t.pruneFiles("k = 'a'")
    assert(kept.size < total, "k=b / k=c files must be pruned")
    assert(kept.nonEmpty && kept.forall(_.contains("k=a")))
  }
}
