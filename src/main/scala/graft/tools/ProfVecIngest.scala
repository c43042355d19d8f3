package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{GraftSession, Tables}
import graft.queries.Scratch
import graft.vector.AnnIndex

/** Phase attribution for q242 (streaming vector ingest loop). */
object ProfVecIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val e = Tables.t(s, sfDir, "embeddings").select("vec_id", "embedding")
    e.count()
    def tm[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to reps) {
      val (idx, tBuild) = tm(AnnIndex.buildIvf(e, Scratch.dir("pvl"), nlist = 16))
      val copies = e.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val novel = s.range(5).select((col("id") + 200000).as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => when(j === col("id").cast("int"), lit(1.0f))
            .otherwise(lit(0.0f))).as("embedding"))
      val in = Scratch.dir("pvlsrc")
      val (_, tWrite) = tm(copies.unionByName(novel).coalesce(1)
        .write.mode("overwrite").parquet(in))
      var tProbe = 0.0; var tAppend = 0.0
      val (_, tStream) = tm {
        val q = s.readStream.schema(e.schema).parquet(in)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", Scratch.dir("pvlck"))
          .foreachBatch { (b: DataFrame, _: Long) =>
            // bracket an ACTION on the probe result — probePairs is lazy
            // except its internal probed-cells collect, so timing only
            // the call would charge the similarity join to append
            val losers = AnnIndex.probePairs(idx, b, 0.95, 2)
              .select(col("id1").as("vec_id")).distinct().persist()
            try {
              val (_, tp) = tm(losers.count())
              val (_, ta) = tm(AnnIndex.append(idx,
                b.join(losers, Seq("vec_id"), "left_anti")))
              tProbe += tp; tAppend += ta
            } finally losers.unpersist()
            ()
          }.start()
        q.awaitTermination()
      }
      val (_, tReprobe) = tm(AnnIndex.probePairs(idx,
        novel.select((col("vec_id") + 500000).as("vec_id"), col("embedding")),
        0.95, 2).select("id1").distinct().count())
      val (_, tRead) = tm(idx.read().select("vec_id").orderBy("vec_id").collect())
      println(f"[profvec] rep=$rep build=$tBuild%.2f srcwrite=$tWrite%.2f stream=$tStream%.2f (probe=$tProbe%.2f append=$tAppend%.2f) reprobe=$tReprobe%.2f read=$tRead%.2f")
    }
    s.stop()
  }
}
