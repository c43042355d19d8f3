package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.queries.Scratch

/** Step-level wall attribution for the composite maintenance/ingest gates
  * (guide §1: decide where the wall goes before touching anything). The
  * gate bodies are replicated VERBATIM with a timer around each step —
  * ProfJobs attributes tasks-vs-driver per gate, this names the step.
  * Dev tool only; the catalogued queries are untouched.
  *
  * Usage: runMain graft.tools.ProfSteps <sfDir> <q245|q218|q259|q58> [reps]
  */
object ProfSteps {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())

    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[step] $name%-38s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (rep <- 1 to reps) {
      Harness.resetRunState(spark, gc = true)
      println(s"=== $which rep $rep ===")
      which match {
        case "q245" => q245(spark, sfDir, step)
        case "q218" => q218(spark, sfDir, step)
        case "q259" => q259(spark, sfDir, step)
        case "q58" => q58(spark, sfDir, step)
        case "q216plan" => q216plan(spark, sfDir, step)
        case other => sys.error(s"unknown: $other")
      }
    }
    spark.stop()
  }

  type Step = String => (=> Any) => Any

  private def q245(s: org.apache.spark.sql.SparkSession, dir: String,
      step: Step): Unit = {
    import graft.optimizer.WorkloadOptimizer
    import graft.tables.GraftTable
    val p = Scratch.dir("optapply")
    val o = Tables.t(s, dir, "orders")
    val t = GraftTable.create(s, p, o.schema)
    step("append repartition(32)") { t.append(o.repartition(32)) }
    step("driver Files.size") {
      val totalBytes = t.filesAt()
        .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
      t.setProperties(Map("graft.targetFileSize" ->
        math.max(totalBytes / 16, 4 * 1024).toString))
    }
    val preds = Seq("o_orderkey = 42", "o_orderdate >= TIMESTAMP '1996-01-01'")
    step("fracRead before") { preds.map(pr => t.pruneFiles(pr)._1.size) }
    val strat = step("buildStrategy (exact cardinality)") {
      WorkloadOptimizer.buildStrategy(s, graft.queries.OptimizerQueries.workload(dir),
        Map("orders" -> (t.read(), None)), minDistinct = 50,
        exactCardinality = true).find(_.table == "orders").get
    }.asInstanceOf[graft.optimizer.WorkloadOptimizer.Strategy]
    step("OPTIMIZE via sql router") {
      val g = new graft.sql.GraftSql(s, p + "-sql")
      g.register("orders", t)
      g.sql(strat.optimizeCommand)
    }
    step("writePredicateColumns") {
      WorkloadOptimizer.writePredicateColumns(t, strat.zorderCols) }
    step("fracRead after") { preds.map(pr => t.pruneFiles(pr)._1.size) }
    step("readWhere counts") {
      preds.map(pr => t.readWhere(pr).count()) }
  }

  private def q218(s: org.apache.spark.sql.SparkSession, dir: String,
      step: Step): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.text.DedupIndex
    import graft.tables.GraftTable
    val d = Tables.t(s, dir, "documents").select("doc_id", "text")
    val idx = step("DedupIndex.build") {
      DedupIndex.build(d, Scratch.dir("ingidx"), n = 5) }
      .asInstanceOf[GraftTable]
    val in = Scratch.dir("ingsrc")
    step("batch write") {
      val novel = s.range(5).select((col("id") + 300000).as("doc_id"),
        concat_ws(" ", (0 until 6).map(j =>
          concat(lit("nv"), col("id").cast("string"), lit(s"w$j"))): _*).as("text"))
      // ingestBatch inlined (private[queries])
      val batch = d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra token extra2")).as("text"))
        .unionAll(d.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" extra token extra3")).as("text")))
      batch.unionAll(novel)
        .coalesce(1).write.mode("overwrite").parquet(in)
    }
    val survivors = GraftTable.create(s, Scratch.dir("ingout"),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    step("stream (probe+append)") {
      val stream = s.readStream.schema(survivors.schemaAt()).parquet(in)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Scratch.dir("ingckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          val losers = DedupIndex.dedupBatch(idx, b, threshold = 0.5)
            .select(col("d2").as("doc_id")).distinct().persist()
          try {
            println(f"[substep] dedupBatch+persist ${(System.nanoTime() - t0) / 1e9}%6.2f")
            val t1 = System.nanoTime()
            val kept = b.join(losers, Seq("doc_id"), "left_anti")
            survivors.append(kept, "INGEST SURVIVORS")
            println(f"[substep] survivors.append ${(System.nanoTime() - t1) / 1e9}%6.2f")
            val t2 = System.nanoTime()
            DedupIndex.append(idx, kept)
            println(f"[substep] index append ${(System.nanoTime() - t2) / 1e9}%6.2f")
          } finally losers.unpersist()
          ()
        }.start()
      stream.awaitTermination()
    }
    step("reprobe require") {
      val shifted = survivors.read()
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val reprobe = DedupIndex.dedupBatch(idx, shifted, 0.5)
        .select(col("d2").as("doc_id")).distinct()
      require(shifted.join(reprobe, Seq("doc_id"), "left_anti").isEmpty)
    }
    step("final read+noop") {
      survivors.read().orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
  }

  private def q259(s: org.apache.spark.sql.SparkSession, dir: String,
      step: Step): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.multimodal.MediaSniff
    import graft.tables.GraftTable
    import graft.text.DedupOps
    val spine = Tables.t(s, dir, "documents").select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    def repPattern(g: org.apache.spark.sql.Column) =
      (0 until 8).map { j =>
        when(shiftright(g, j).bitwiseAND(lit(1L)) =!= 0,
          lit(255L << (8 * j))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    def containerOf(shift: Int) =
      expr(s"element_at(array('avi','mp4','fmp4'), " +
        s"cast((doc_id + $shift) % 3 as int) + 1)")
    def clip(p: org.apache.spark.sql.Column, shift: Int) =
      MediaSniff.encodePosterClipUdf(p, lit(2), lit(10), lit(4),
        containerOf(shift))
    val t = step("corpus fingerprint table") {
      val corpusFps = spine
        .withColumn("blob", clip(repPattern(pmod(col("doc_id"), lit(50L))), 0))
        .select(col("doc_id"), MediaSniff.posterHashUdf(col("blob")).as("fp"))
      GraftTable.createFrom(s, Scratch.dir("medialoop"), corpusFps)
    }.asInstanceOf[GraftTable]
    val novel = spine.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        clip(repPattern(pmod(col("doc_id"), lit(50L)) + 100), 2).as("blob"))
    val in = Scratch.dir("medialoopsrc")
    step("drop write (coalesce 1)") {
      val copies = spine.select((col("doc_id") + 100000).as("doc_id"),
        clip(repPattern(pmod(col("doc_id"), lit(50L))), 1).as("blob"))
      val corrupt = spine.filter(pmod(col("doc_id"), lit(10)) === 5)
        .withColumn("blob0", clip(repPattern(pmod(col("doc_id"), lit(50L))), 0))
        .select((col("doc_id") + 300000).as("doc_id"),
          expr("substring(blob0, 1, 20)").as("blob"))
      copies.unionByName(novel).unionByName(corrupt)
        .coalesce(1).write.mode("overwrite").parquet(in)
    }
    val nNovel = step("novel.count") { novel.count() }.asInstanceOf[Long]
    step("stream (decode+probe+append)") {
      val stream = s.readStream.schema(
          new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("blob", "binary")).parquet(in)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Scratch.dir("medialoopckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          val fps = b.select(col("doc_id"),
              MediaSniff.posterHashUdf(col("blob")).as("fp"))
            .filter(col("fp").isNotNull)
            .localCheckpoint()
          println(f"[substep] decode+localCheckpoint ${(System.nanoTime() - t0) / 1e9}%6.2f")
          val t1 = System.nanoTime()
          val losers = DedupOps.fingerprintProbe(fps, t.read(),
            "doc_id", "fp", maxHamming = 2)
            .select(col("batch_id").as("doc_id")).distinct()
          t.append(fps.join(losers, Seq("doc_id"), "left_anti"))
          println(f"[substep] probe+append ${(System.nanoTime() - t1) / 1e9}%6.2f")
          ()
        }.start()
      stream.awaitTermination()
    }
    step("reprobe require") {
      val reprobe = DedupOps.fingerprintProbe(
        novel.select((col("doc_id") + 300000).as("doc_id"),
          MediaSniff.posterHashUdf(col("blob")).as("fp")),
        t.read(), "doc_id", "fp", maxHamming = 2)
        .select("batch_id").distinct()
      require(reprobe.count() == nNovel)
    }
    step("final read+noop") {
      t.read().select("doc_id").orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
  }

  private def q216plan(s: org.apache.spark.sql.SparkSession, dir: String,
      step: Step): Unit = {
    import graft.text.{DedupIndex, DedupOps}
    import graft.tables.GraftTable
    val d = Tables.t(s, dir, "documents").select("doc_id", "text")
    val path = Scratch.dir("dedupidx")
    DedupIndex.build(d, path, n = 5)
    val reopened = GraftTable.load(s, path)
    val batch = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra token extra2")).as("text"))
    val batchGrams = DedupOps.shingleTable(batch, 5).persist()
    val pipe = DedupOps.incrementalPipeline(
      reopened.read().select("doc_id", "shingle"), batchGrams, 0.5,
      materializeCandidates = false)
    println(pipe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    step("un-cut pipeline noop") {
      pipe.write.format("noop").mode("overwrite").save() }
    batchGrams.unpersist()
  }

  private def q58(s: org.apache.spark.sql.SparkSession, dir: String,
      step: Step): Unit = {
    import graft.tables.{GraftTable, Maintenance}
    val li = Tables.t(s, dir, "lineitem")
    val tbl = step("createFrom copy") {
      GraftTable.createFrom(s, Scratch.dir("opt"), li) }
      .asInstanceOf[GraftTable]
    step("optimize (zorder 2col)") {
      Maintenance.optimize(tbl, zorderBy = Seq("l_shipdate", "l_orderkey")) }
    step("read-back orderBy noop") {
      tbl.read().select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
    }
  }
}
