package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tables.GraftTable

/** mapGroupsWithState session counting: state must carry across
  * micro-batches (separate availableNow runs over the same checkpoint),
  * and the final result must equal the batch gaps-and-islands
  * computation over the full history. */
class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)

  // (user, value, minute): u1 has sessions {0,5}, {60,61}; u2 has {0}, {90}
  private val batch1 = Seq(
    (1L, 1.0, 0), (1L, 2.0, 5), (2L, 5.0, 0))
  private val batch2 = Seq(
    (1L, 3.0, 60), (1L, 4.0, 61), (2L, 6.0, 90))

  private def write(dir: String, rows: Seq[(Long, Double, Int)], tag: String): Unit =
    rows.map { case (u, v, m) => (u, v, ts(m)) }
      .toDF("user_id", "value", "ts")
      .coalesce(1).write.parquet(s"$dir/$tag")

  private def batchOracle(rows: Seq[(Long, Double, Int)]): Map[Long, (Long, Double, Long)] = {
    val df = rows.map { case (u, v, m) => (u, v, ts(m)) }.toDF("user_id", "value", "ts")
    val w = Window.partitionBy("user_id").orderBy("ts")
    df.withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") >= 30L * 60 * 1000000, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total"), sum("new_session").as("sessions"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
  }

  test("state carries across micro-batch runs and matches batch semantics") {
    val src = scratch("stateful-src")
    val ck = scratch("stateful-ck")
    Files.createDirectories(Paths.get(src))
    write(src, batch1, "b1")

    val schema = spark.read.parquet(s"$src/b1").schema
    def stream: DataFrame = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(src)
    val sinkSchema = Stateful.userSessions(
      batch1.map { case (u, v, m) => (u, v, ts(m)) }.toDF("user_id", "value", "ts"), 30)
      .toDF().schema
    val sink = GraftTable.create(spark, scratch("stateful-t"), sinkSchema)

    StreamOps.updateToTable(Stateful.userSessions(stream, 30).toDF(), sink, Seq("user_id"), ck)
    val mid = sink.read().as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(mid === Map(1L -> ((2L, 3.0, 1L)), 2L -> ((1L, 5.0, 1L))),
      "after batch 1: one session each")

    // second availableNow run over the same checkpoint: only the new file
    // is processed; state store continues the session chains
    write(src, batch2, "b2")
    StreamOps.updateToTable(Stateful.userSessions(stream, 30).toDF(), sink, Seq("user_id"), ck)
    val fin = sink.read().as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val expect = batchOracle(batch1 ++ batch2)
    assert(fin === expect.map { case (k, (n, t, s)) => k -> ((n, t, s)) })
    assert(fin(1L) === ((4L, 10.0, 2L)), "60-min gap opened u1's second session")
    assert(fin(2L) === ((2L, 11.0, 2L)))
  }

  test("batch-mode userSessions equals the window-function computation") {
    val all = (batch1 ++ batch2).map { case (u, v, m) => (u, v, ts(m)) }
      .toDF("user_id", "value", "ts")
    val got = Stateful.userSessions(all, 30).collect()
      .map(r => r.user_id -> ((r.n, r.total_value, r.sessions))).toMap
    val expect = batchOracle(batch1 ++ batch2)
    assert(got === expect.map { case (k, (n, t, s)) => k -> ((n, t, s)) })
  }
}
